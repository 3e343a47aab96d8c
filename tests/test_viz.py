"""Tests for the debug-visualization exports (cge_tpu.viz)."""

import numpy as np

from cge_tpu import Camera, Features, RenderParams, SceneType, \
    load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.ops.bvh import build_reference_bvh
from cge_tpu.viz import (aabb_segments, debug_trace, draw_segments,
                         normal_segments, project_points)


def test_debug_trace_levels():
    scene = load_scene_prebuilt(SceneType.CornellBox)
    cam = Camera()
    # shoot the center pixel + a guaranteed-miss ray
    o, d = cam.generate_rays(np.array([[0.0, 0.0], [0.99, 0.99]], np.float32))
    feats = Features(enable_shading=True, enable_hard_shadow=True,
                     enable_recursive=True)
    levels = debug_trace(scene, o, d, feats, RenderParams())
    assert 1 <= len(levels) <= 6
    l0 = levels[0]
    assert l0.hit[0]                       # center ray hits the box
    assert (l0.color[~l0.hit] == np.array([1, 0, 0], np.float32)).all()
    assert (l0.t[~l0.hit] == 100.0).all()  # drawRay miss clamp


def test_project_points_roundtrip():
    """generate_rays -> march along the ray -> project back: must land on
    the originating pixel (validates the -x quirk inversion)."""
    cam = Camera()
    W = H = 64
    ndc = np.array([[-0.5, 0.25], [0.3, -0.7]], np.float32)
    o, d = cam.generate_rays(ndc)
    pts = np.asarray(o) + 2.0 * np.asarray(d)
    px, in_front = project_points(cam, pts, W, H)
    assert in_front.all()
    want_x = (ndc[:, 0] + 1) * 0.5 * W
    want_y = (1.0 - (ndc[:, 1] + 1) * 0.5) * H
    np.testing.assert_allclose(px[:, 0], want_x, atol=1e-2)
    np.testing.assert_allclose(px[:, 1], want_y, atol=1e-2)


def test_aabb_segments_and_overlay():
    scene = load_scene_prebuilt(SceneType.CornellBox)
    bvh = build_reference_bvh(scene)
    lo, hi = bvh.debug_level_boxes(2)
    a, b = aabb_segments(lo, hi)
    assert a.shape == (len(lo) * 12, 3) and b.shape == a.shape
    # every segment endpoint lies on its box surface
    img = np.zeros((64, 64, 3), np.float32)
    out = draw_segments(img, Camera(), a, b, color=(0, 1, 0))
    assert out.shape == img.shape
    assert (out[..., 1] > 0).any()         # something was drawn
    assert (img == 0).all()                # original untouched


def test_normal_segments():
    scene = load_scene_prebuilt(SceneType.Monkey)
    starts, ends = normal_segments(scene, 0, length=0.1)
    assert starts.shape == (3, 3)
    np.testing.assert_allclose(np.linalg.norm(ends - starts, axis=-1), 0.1,
                               rtol=1e-4)


def test_debug_trace_transparency_continuation():
    """The debug replay follows the transparency continuation path
    (render.cpp:42-43,108-111), not just mirrors: a ray through the
    translucent cube must spawn a continuation child level."""
    import dataclasses

    import jax.numpy as jnp

    from cge_tpu import SceneType, load_scene_prebuilt
    from cge_tpu.camera import Camera
    from cge_tpu.types import Features, RenderParams
    from cge_tpu.viz.debug import debug_trace

    scene = load_scene_prebuilt(SceneType.Cube)
    scene = dataclasses.replace(
        scene,
        point_pos=jnp.concatenate([scene.point_pos,
                                   jnp.array([(-1.0, 1.5, -1.0)],
                                             jnp.float32)]),
        point_color=jnp.concatenate([scene.point_color,
                                     jnp.ones((1, 3), jnp.float32)]),
        point_mask=jnp.concatenate([scene.point_mask, jnp.ones(1, bool)]))
    cam = Camera()
    feats = Features(enable_shading=True, enable_transparency=True)
    o, d = cam.generate_rays(jnp.asarray([[0.0, 0.2]], jnp.float32))
    levels = debug_trace(scene, o, d, feats, RenderParams())
    assert len(levels) >= 2, "no continuation level replayed"
    assert levels[0].hit.any()
    # the continuation keeps the parent's direction (render.cpp:42-43)
    import numpy as np
    np.testing.assert_allclose(levels[1].dir[0], levels[0].dir[0],
                               rtol=1e-6)


def test_debug_sample_sets():
    """MSAA / DoF debug ray sets (main.cpp:95-100)."""
    from cge_tpu.camera import Camera
    from cge_tpu.types import RenderParams
    from cge_tpu.viz.debug import debug_dof_rays, debug_ray_samples

    import numpy as np

    cam = Camera()
    params = RenderParams()
    o, d = debug_ray_samples(0.1, -0.2, cam, params)
    assert o.shape == (params.rays_per_pixel_side ** 2, 3)
    # pinhole: all sample rays share the camera origin, directions jitter
    assert np.allclose(np.asarray(o), np.asarray(o)[0])
    assert np.std(np.asarray(d), axis=0).max() > 0

    o, d = debug_dof_rays(0.1, -0.2, cam, params)
    assert o.shape == (params.samples_dof, 3)
    # DoF: origins jitter on the aperture disk
    assert np.std(np.asarray(o), axis=0).max() > 0


def test_traversal_debug_replay():
    """Visited-node traversal replay (bounding_volume_hierarchy.cpp:338-360):
    the gray set must contain every node on the path to the hit, the replay's
    winning triangle must match the device traversal's closest hit, and a
    miss ray that enters the root must flag red dead-end parents."""
    import numpy as np

    from cge_tpu.camera import Camera
    from cge_tpu.ops.bvh import build_reference_bvh
    from cge_tpu.ops.bvh_traverse import bvh_closest_hit, device_bvh
    from cge_tpu.scene.scene import SceneType, load_scene_prebuilt
    from cge_tpu.viz.debug import traversal_debug

    import jax.numpy as jnp

    scene = load_scene_prebuilt(SceneType.Monkey)
    bvh = build_reference_bvh(scene)
    cam = Camera()
    o, d = cam.generate_rays(jnp.asarray([[0.0, 0.0]], jnp.float32))
    td = traversal_debug(bvh, scene, np.asarray(o)[0], np.asarray(d)[0])
    assert td.visited_lo.shape[0] > 0
    assert td.tri is not None and td.tri.shape == (3, 3)
    # parity with the device-side reference traversal
    dbvh = device_bvh(bvh, scene)
    hit, t, is_sph, prim = bvh_closest_hit(
        dbvh, o, d, jnp.full(1, np.inf, jnp.float32))
    assert bool(hit[0]) and not bool(is_sph[0])
    tri_dev = np.asarray(scene.vertices)[
        np.asarray(scene.tris)[int(prim[0])]]
    np.testing.assert_allclose(td.tri, tri_dev, rtol=1e-6)
    # depths recorded for UI filtering
    assert (td.visited_depth >= 1).all()

    # a ray that pierces the root box but misses everything inside hits
    # dead-end parents (both children miss -> red draw, cpp:355-359)
    td_miss = traversal_debug(bvh, scene, np.array([3.0, 2.0, -3.0]),
                              np.array([0.0, 0.0, 1.0], np.float32))
    assert td_miss.tri is None


def test_sah_split_planes():
    """debugDrawSAHSplits export (cpp:230-237): candidate planes are
    degenerate AABBs flattened on the chosen axis inside the parent box,
    with exactly one chosen plane globally per node."""
    import numpy as np

    from cge_tpu.ops.bvh import build_reference_bvh
    from cge_tpu.scene.scene import SceneType, load_scene_prebuilt

    scene = load_scene_prebuilt(SceneType.CornellBox)
    bvh = build_reference_bvh(scene, sah_binning=True, record_sah_cuts=True)
    assert bvh.sah_cuts_per_level is not None
    assert len(bvh.sah_cuts_per_level) > 0
    found_any = False
    for level in range(len(bvh.sah_cuts_per_level)):
        per_node_chosen = sum(
            1 for _ in bvh.sah_cuts_per_level[level])
        for axis in range(3):
            lo, hi, chosen = bvh.debug_sah_splits(level, axis)
            assert lo.shape == hi.shape
            if lo.shape[0]:
                found_any = True
                # planes are flattened along their axis
                np.testing.assert_allclose(lo[:, axis], hi[:, axis])
                # and live inside the level's node boxes on the other axes
                assert (hi >= lo - 1e-6).all()
        # exactly one chosen (axis, index) per recorded node
        n_chosen = sum(int(bvh.debug_sah_splits(level, ax)[2].sum())
                       for ax in range(3))
        assert n_chosen == per_node_chosen
    assert found_any
