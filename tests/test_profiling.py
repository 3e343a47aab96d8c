"""Profiling/observability hooks (cge_tpu.utils.profiling)."""

import numpy as np

from cge_tpu import Camera, Features, RenderParams, SceneType, \
    load_scene_prebuilt
from cge_tpu.utils.profiling import (count_rays, sweep_roofline,
                                     timed_bvh_build, timed_render)


def test_timed_render_and_stats():
    scene = load_scene_prebuilt(SceneType.SingleTriangle)
    img, stats = timed_render(scene, Camera(),
                              Features(enable_shading=True),
                              RenderParams(), 16, 16)
    assert img.shape == (16, 16, 3)
    assert stats.wall_ms > 0
    assert stats.primary_rays == 256
    assert stats.rays_per_s > 0
    assert "Mrays/s" in str(stats)


def test_count_rays_modes():
    scene = load_scene_prebuilt(SceneType.CornellBox)  # 1 point light
    params = RenderParams()
    base = count_rays(8, 8, scene, Features(enable_shading=True), params)
    assert base == 64  # no shadows, no recursion: one level, no shadow rays
    hard = count_rays(8, 8, scene, Features(enable_shading=True,
                                            enable_hard_shadow=True), params)
    assert hard == 64 * 2
    rec = count_rays(8, 8, scene, Features(enable_shading=True,
                                           enable_hard_shadow=True,
                                           enable_recursive=True), params)
    assert rec == 64 * 2 * 6  # depth 5 -> 6 levels


def test_bvh_build_stats():
    scene = load_scene_prebuilt(SceneType.CornellBox)
    bvh, stats = timed_bvh_build(scene)
    assert stats.max_per_leaf == bvh.max_per_leaf
    assert "BVH generation took" in str(stats)


def test_roofline():
    r = sweep_roofline(1 << 20, 1 << 10, 0.5)
    assert r["pair_tests"] == 1 << 30
    assert 0 < r["fraction_of_peak"] < 1


def test_camera_interaction():
    """orbit/pan/zoom parity with the trackball handlers
    (trackball.cpp:136-164)."""
    import numpy as _np

    cam = Camera()
    # orbit: pitch clamps at +-pi/2
    c2 = cam.orbit(0.0, 1e6)
    assert c2.rotation[0] == -_np.pi / 2
    c3 = cam.orbit(10.0, 0.0)
    assert c3.rotation[1] < cam.rotation[1]
    # zoom: clamped to [0.1, 100]
    assert cam.zoom(1e9).distance == 0.1
    assert cam.zoom(-1e9).distance == 100.0
    # pan moves look_at in the image plane
    c4 = cam.pan(100.0, 0.0)
    assert not _np.allclose(c4.look_at, cam.look_at)
    # distance unchanged by orbit/pan
    assert c4.distance == cam.distance == c3.distance


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from cge_tpu.diff.gradients import scene_params
    from cge_tpu.utils import checkpoint as ckpt

    scene = load_scene_prebuilt(SceneType.SingleTriangle)
    p = scene_params(scene)
    d = str(tmp_path / "ckpts")
    ckpt.save(d, 3, p)
    ckpt.save(d, 7, p)
    assert ckpt.latest_step(d) == 7
    restored = ckpt.restore(d, template=p)
    import jax

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p, restored)
