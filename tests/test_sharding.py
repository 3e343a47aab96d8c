"""Sharding tests on the virtual 8-device CPU mesh: sharded results must
match single-device results exactly for deterministic feature sets, and the
sharded train step must produce finite loss + moving gradients."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cge_tpu import (Camera, Features, RenderParams, SceneType,
                     load_scene_prebuilt, render_image)
from cge_tpu.camera import pixel_grid
from cge_tpu.parallel.sharding import (make_mesh, render_image_sharded,
                                       train_step_sharded)

FEATS = Features(enable_shading=True, enable_hard_shadow=True,
                 enable_recursive=True)


@pytest.fixture(scope="module")
def scene():
    s = load_scene_prebuilt(SceneType.CornellBox)
    # pad triangle table so it splits over a prims axis of 2
    T = s.tris.shape[0]
    pad = (-T) % 2
    if pad:
        s = dataclasses.replace(
            s, tris=jnp.pad(s.tris, ((0, pad), (0, 0))),
            tri_mat=jnp.pad(s.tri_mat, (0, pad)),
            tri_mask=jnp.pad(s.tri_mask, (0, pad)))
    return s


def _cmp(a, b):
    a, b = np.asarray(a), np.asarray(b)
    nan_a, nan_b = ~np.isfinite(a), ~np.isfinite(b)
    assert (nan_a == nan_b).all()
    np.testing.assert_allclose(np.where(nan_a, 0, a), np.where(nan_b, 0, b),
                               rtol=1e-6, atol=1e-6)


def test_rays_sharding_matches_single_device(scene):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(("rays",), (8,))
    ref = render_image(scene, Camera(), FEATS, RenderParams(), 16, 16)
    out = render_image_sharded(scene, Camera(), FEATS, RenderParams(),
                               16, 16, mesh)
    _cmp(out, ref)


def test_rays_x_prims_sharding_matches(scene):
    mesh = make_mesh(("rays", "prims"), (4, 2))
    ref = render_image(scene, Camera(), FEATS, RenderParams(), 16, 16)
    out = render_image_sharded(scene, Camera(), FEATS, RenderParams(),
                               16, 16, mesh)
    _cmp(out, ref)


def test_prims_cluster_accel_matches_single_device(monkeypatch):
    """The prims-sharded CLUSTER sweep (r4: superclusters sharded across the
    axis, global perm-space ids, tie-aware all_gather reduce) must agree
    with the single-device cluster sweep. Runs the Pallas kernel in
    interpreter mode on the CPU mesh via FORCE_CLUSTER_INTERPRET."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from cge_tpu.ops import intersect

    monkeypatch.setattr(intersect, "FORCE_CLUSTER_INTERPRET", True)
    s = load_scene_prebuilt(SceneType.Monkey)       # 8 clusters of 128
    accel = intersect.build_accel(s)
    grid = pixel_grid(16, 16).reshape(-1, 2)
    o, d = Camera().generate_rays(grid)
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)

    ref = intersect.closest_hit(s, o, d, tmax, accel=accel)

    mesh = make_mesh(("prims",), (2,), devices=jax.devices()[:2])

    def f(o, d, t):
        return intersect.closest_hit(s, o, d, t, prims_axis="prims",
                                     prims_axis_size=2, accel=accel)

    # check_vma=False: pallas_call cannot declare varying-mesh-axes info
    out = shard_map(f, mesh=mesh, in_specs=(P(), P(), P()),
                    out_specs=P(), check_vma=False)(o, d, tmax)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    both = np.asarray(out.hit)
    np.testing.assert_allclose(np.asarray(out.t)[both],
                               np.asarray(ref.t)[both], rtol=0, atol=0)
    # ids may differ only on exact-t ties (documented divergence class);
    # identical t + identical geometry makes real divergence ~impossible
    # on this scene, so require full agreement here
    np.testing.assert_array_equal(np.asarray(out.prim)[both],
                                  np.asarray(ref.prim)[both])


def test_prims_cluster_render_matches_single_device(scene, monkeypatch):
    """End-to-end: a rays x prims sharded render through the cluster accel
    branch (perm-space attribute tables + global flat ids under TP) equals
    the single-device render, interpreter-mode kernel on the CPU mesh."""
    from cge_tpu.ops import intersect

    monkeypatch.setattr(intersect, "FORCE_CLUSTER_INTERPRET", True)
    feats = dataclasses.replace(FEATS, enable_accel_structure=True)
    mesh = make_mesh(("rays", "prims"), (4, 2))
    ref = render_image(scene, Camera(), feats, RenderParams(), 16, 16)
    out = render_image_sharded(scene, Camera(), feats, RenderParams(),
                               16, 16, mesh)
    _cmp(out, ref)


def test_train_step_sharded(scene):
    mesh = make_mesh(("rays", "prims"), (4, 2))
    grid = pixel_grid(8, 8).reshape(-1, 2)
    o, d = Camera().generate_rays(grid)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    loss, new_scene = train_step_sharded(
        scene, o, d, target, FEATS, RenderParams(), mesh, lr=1e-3)
    assert np.isfinite(float(loss))
    moved = float(jnp.abs(new_scene.mat_kd - scene.mat_kd).sum())
    assert moved > 0, "gradients did not flow to materials"


# ---------------------------------------------------------------------------
# r5: sharded loss/grads == single-device across the FULL feature matrix.
# Stochastic streams are keyed by global ray id (cge_tpu.render.lights.
# per_ray_uniform), so even the soft-shadow jitter matches exactly between
# mesh shapes — the psum'd gradient path for soft shadows / textures /
# TRANS+REC executes and must agree with the unsharded trace.
# ---------------------------------------------------------------------------

GRAD_FEATURE_SETS = {
    # segment-light 25-sample + parallelogram 5x5 stratification
    # (light.cpp:123-157) through the shadow sweeps' backward
    "soft_segment": ("cube",
                     Features(enable_shading=True, enable_soft_shadow=True)),
    "soft_parallelogram": ("cornell_box_parallelogram_light",
                           Features(enable_shading=True,
                                    enable_soft_shadow=True)),
    # texture lerp backward (texture.cpp:30-47)
    "texture": ("cube_textured",
                Features(enable_shading=True, enable_hard_shadow=True,
                         enable_texture_mapping=True,
                         enable_bilinear_texture_filtering=True)),
    # the 2^depth folded TRANS+REC tree (render.cpp:106-132)
    # soft shadows so the cube's segment light contributes (quirk #15
    # makes a hard-shadow-only cube black: zero loss would test nothing)
    "transrec": ("cube",
                 Features(enable_shading=True, enable_soft_shadow=True,
                          enable_recursive=True, enable_transparency=True)),
}


@pytest.mark.parametrize("name", sorted(GRAD_FEATURE_SETS))
def test_train_step_sharded_equals_single_device(name):
    from cge_tpu.scene.scene import deserialize_scene_type

    scene_name, feats = GRAD_FEATURE_SETS[name]
    s = load_scene_prebuilt(deserialize_scene_type(scene_name))
    T = s.tris.shape[0]
    pad = (-T) % 2
    if pad:
        s = dataclasses.replace(
            s, tris=jnp.pad(s.tris, ((0, pad), (0, 0))),
            tri_mat=jnp.pad(s.tri_mat, (0, pad)),
            tri_mask=jnp.pad(s.tri_mask, (0, pad)))
    grid = pixel_grid(8, 8).reshape(-1, 2)    # 64 rays: divides every mesh
    o, d = Camera().generate_rays(grid)
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    params = RenderParams()
    if feats.enable_transparency and feats.enable_recursive:
        # depth-3 tree: the full-depth 2^5 tree + 11-level tail costs
        # many CPU-compile minutes and adds no coverage here
        params = params.replace(ray_depth=3, extra_transparency_unroll=1)

    ref_mesh = make_mesh(("rays", "prims"), (1, 1),
                         devices=jax.devices()[:1])
    loss0, scene0 = train_step_sharded(s, o, d, target, feats, params,
                                       ref_mesh, lr=1e-3)
    for shape in [(8, 1), (4, 2)]:
        mesh = make_mesh(("rays", "prims"), shape)
        loss1, scene1 = train_step_sharded(s, o, d, target, feats, params,
                                           mesh, lr=1e-3)
        _cmp(loss1, loss0)
        # the updated scene embeds lr * grads: leaf-wise equality is the
        # grads == single-device assertion; gradients must also be FINITE
        # (a NaN-masked comparison hid the r5 transrec normalize-backward
        # bug until the movement check tripped)
        for l0, l1 in zip(jax.tree.leaves(scene0), jax.tree.leaves(scene1)):
            if hasattr(l0, "dtype") and jnp.issubdtype(l0.dtype,
                                                       jnp.floating):
                assert np.isfinite(np.asarray(l0)).all()
                assert np.isfinite(np.asarray(l1)).all()
                _cmp(l1, l0)
    # and the gradients moved something
    moved = sum(float(jnp.abs(a - b).sum())
                for a, b in zip(jax.tree.leaves(scene0), jax.tree.leaves(s))
                if hasattr(a, "dtype")
                and jnp.issubdtype(a.dtype, jnp.floating))
    assert moved > 0, f"no parameter movement for {name}"


def test_soft_shadow_render_chunk_invariant():
    """The per-ray threefry streams make stochastic renders independent of
    trace_chunk — chunked == unchunked bit-exact (r5)."""
    s = load_scene_prebuilt(SceneType.CornellBoxParallelogramLight)
    feats = Features(enable_shading=True, enable_soft_shadow=True)
    img_a = render_image(s, Camera(), feats, RenderParams(), 16, 16)
    small = RenderParams().replace(trace_chunk=64)
    img_b = render_image(s, Camera(), feats, small, 16, 16)
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
