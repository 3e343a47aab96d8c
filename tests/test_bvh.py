"""Acceleration-structure tests.

1. Reference-parity BVH builder invariants (split rules, leaf rule, stats —
   bounding_volume_hierarchy.cpp:74-147) and traversal-free consistency: a
   brute sweep restricted to each leaf's range must cover every primitive
   exactly once.
2. Cluster-sweep Pallas kernel (interpret mode) vs the brute-force sweep:
   identical closest-hit t everywhere, identical hit ids away from exact-t
   ties (equal-t ties resolve in cluster order — same divergence class as
   the reference's own BVH-on traversal, SURVEY.md §2.5 #11).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cge_tpu import Camera, SceneType, load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.ops.bvh import build_clusters, build_reference_bvh
from cge_tpu.ops.intersect import _closest_tris_sweep
from cge_tpu.ops.pallas.cluster_sweep import (pack_cluster_tiles,
                                              pallas_cluster_tris)


@pytest.fixture(scope="module")
def cornell():
    return load_scene_prebuilt(SceneType.CornellBox)


@pytest.fixture(scope="module")
def monkey():
    return load_scene_prebuilt(SceneType.Monkey)


def _rays(scene, n_side=24):
    cam = Camera()
    grid = pixel_grid(n_side, n_side).reshape(-1, 2)
    return cam.generate_rays(grid)


# ---------------------------------------------------------------------------
# reference-parity BVH builder
# ---------------------------------------------------------------------------

def test_reference_bvh_invariants(cornell):
    for sah in (False, True):
        bvh = build_reference_bvh(cornell, sah_binning=sah)
        P = int(np.asarray(cornell.tri_mask).sum())
        assert len(bvh.perm_index) == P
        # the permutation must cover every valid triangle exactly once
        assert sorted(bvh.perm_index.tolist()) == sorted(
            np.nonzero(np.asarray(cornell.tri_mask))[0].tolist())
        assert 1 <= bvh.num_levels <= 16
        meta = bvh.node_meta
        leaves = meta[meta[:, 0] == 1]
        internals = meta[meta[:, 0] == 0]
        assert len(leaves) == bvh.num_leaves
        # leaf ranges partition [0, P): disjoint and complete
        spans = sorted((int(b), int(e)) for b, e in leaves[:, 2:4])
        cursor = 0
        for b, e in spans:
            assert b == cursor and e > b
            cursor = e
        assert cursor == P
        assert bvh.max_per_leaf == max(e - b for b, e in spans)
        # children AABBs are contained in the parent
        for n in internals:
            for child in (n[4], n[5]):
                assert (bvh.node_lo[child] >= bvh.node_lo[int(np.where(
                    (meta == n).all(axis=1))[0][0])] - 1e-6).all()
        # leaf rule: only 1-prim leaves above depth 15 (cpp:136)
        for n in leaves:
            assert n[1] + 1 == 16 or n[3] - n[2] == 1 or n[1] + 1 == 16


def test_reference_bvh_sphere_scene():
    scene = load_scene_prebuilt(SceneType.Spheres)
    bvh = build_reference_bvh(scene)
    assert bvh.perm_is_sphere.all()
    assert len(bvh.perm_index) == 3
    assert bvh.num_leaves == 3  # 3 prims -> median splits to single leaves


def test_debug_level_and_leaf_api(cornell):
    bvh = build_reference_bvh(cornell)
    lo0, hi0 = bvh.debug_level_boxes(0)
    assert lo0.shape == (1, 3)  # exactly the root at depth 0
    leaf = bvh.debug_leaf(1)
    assert leaf is not None
    lo, hi, ids, is_sph = leaf
    assert (lo <= hi).all() and len(ids) >= 1


# ---------------------------------------------------------------------------
# cluster accel: build + Pallas sweep (interpret mode)
# ---------------------------------------------------------------------------

def test_build_clusters_covers_all(monkey):
    perm = build_clusters(monkey.vertices, monkey.tris, monkey.tri_mask, cluster_size=128)
    valid = perm[perm >= 0]
    want = np.nonzero(np.asarray(monkey.tri_mask))[0]
    assert sorted(valid.tolist()) == sorted(want.tolist())
    assert perm.shape[1] == 128


@pytest.mark.parametrize("scene_type", [SceneType.CornellBox, SceneType.Monkey])
def test_cluster_sweep_matches_brute(scene_type):
    scene = load_scene_prebuilt(scene_type)
    o, d = _rays(scene)
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)

    bt, bi = _closest_tris_sweep(o, d, tmax, scene.vertices, scene.tris,
                                 scene.tri_mask, 512)

    perm = jnp.asarray(build_clusters(scene.vertices, scene.tris, scene.tri_mask, cluster_size=128))
    aabbs, tiles = pack_cluster_tiles(scene.vertices, scene.tris, perm)
    ct, ci = pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=128,
                                 interpret=True)

    bt, bi, ct, ci = map(np.asarray, (bt, bi, ct, ci))
    hit_b = np.isfinite(bt)
    hit_c = np.isfinite(ct)
    np.testing.assert_array_equal(hit_b, hit_c)
    # rtol 5e-6: the brute sweep computes dot(d, n) as an MXU/matmul
    # contraction, the cluster kernel as an elementwise FMA chain — the two
    # roundings differ by ~1 ulp on a few rays
    np.testing.assert_allclose(ct[hit_c], bt[hit_b], rtol=5e-6, atol=1e-7)
    # away from exact ties the ids must agree; at ties both ids must
    # reproduce the same t (verified by the allclose above)
    assert (ci[hit_c] >= 0).all()


def test_cluster_sweep_respects_tmax(cornell):
    o, d = _rays(cornell, 8)
    # a tiny budget kills every hit
    tmax = jnp.full(o.shape[0], 1e-6, jnp.float32)
    perm = jnp.asarray(build_clusters(cornell.vertices, cornell.tris, cornell.tri_mask))
    aabbs, tiles = pack_cluster_tiles(cornell.vertices, cornell.tris, perm)
    ct, ci = pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=128,
                                 interpret=True)
    assert not np.isfinite(np.asarray(ct)).any()
    assert (np.asarray(ci) == -1).all()


def test_cluster_sweep_any_hit_mode(cornell):
    o, d = _rays(cornell, 16)
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
    perm = jnp.asarray(build_clusters(cornell.vertices, cornell.tris,
                                      cornell.tri_mask))
    aabbs, tiles = pack_cluster_tiles(cornell.vertices, cornell.tris, perm)
    ct, _ = pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=128,
                                interpret=True)
    hit, _ = pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=128,
                                 any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(hit),
                                  np.isfinite(np.asarray(ct)))


def test_cluster_sweep_shared_origin(cornell):
    o, d = _rays(cornell, 16)
    # _rays generates a shared-origin pinhole fan
    assert np.allclose(np.asarray(o), np.asarray(o)[0])
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
    perm = jnp.asarray(build_clusters(cornell.vertices, cornell.tris,
                                      cornell.tri_mask))
    aabbs, tiles = pack_cluster_tiles(cornell.vertices, cornell.tris, perm)
    t0, i0 = pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=128,
                                 interpret=True)
    t1, i1 = pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=128,
                                 shared_origin=True, interpret=True)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                               rtol=5e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))


def test_cluster_sweep_hbm_layout_matches_resident(cornell):
    """The HBM (field-major, DMA-streamed) traversal must agree with the
    VMEM-resident layout exactly."""
    o, d = _rays(cornell, 16)
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
    perm = jnp.asarray(build_clusters(cornell.vertices, cornell.tris,
                                      cornell.tri_mask))
    aabbs, tiles_res = pack_cluster_tiles(cornell.vertices, cornell.tris,
                                          perm, hbm=False)
    _, tiles_hbm = pack_cluster_tiles(cornell.vertices, cornell.tris,
                                      perm, hbm=True)
    C = perm.shape[1]
    assert tiles_res.shape[1:] == (C, 16) and tiles_hbm.shape[1:] == (16, C)
    t0, i0 = pallas_cluster_tris(o, d, tmax, aabbs, tiles_res, perm, br=128,
                                 interpret=True)
    t1, i1 = pallas_cluster_tris(o, d, tmax, aabbs, tiles_hbm, perm, br=128,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_cluster_sweep_exit_bound_boundary_hit():
    """r4 scene-exit stop bound: a triangle ON the union box's far face
    must still be hit (the bound is inflated past slab-division rounding),
    and rays that provably miss the scene box must do zero damage."""
    V = jnp.asarray([
        # near triangle at z = 1 (small), far triangle at z = 4 spanning
        # the box's far boundary plane
        [-0.2, -0.2, 1.0], [0.2, -0.2, 1.0], [0.0, 0.25, 1.0],
        [-2.0, -2.0, 4.0], [2.0, -2.0, 4.0], [0.0, 2.5, 4.0],
    ], jnp.float32)
    T = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    mask = np.ones(2, bool)
    perm = jnp.asarray(build_clusters(np.asarray(V), np.asarray(T), mask))
    aabbs, tiles = pack_cluster_tiles(V, T, perm)
    o = jnp.asarray([
        [0.0, 0.0, 0.0],    # hits near tri at t=1
        [1.0, 0.0, 0.0],    # misses near, hits FAR tri exactly on exit face
        [0.0, 0.0, 5.0],    # behind everything, pointing away -> miss
        [10.0, 0.0, 0.0],   # outside the box corridor -> miss
    ], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]] * 3 + [[0.0, 0.0, -1.0]], jnp.float32)
    tmax = jnp.full(4, jnp.inf, jnp.float32)
    t, i = pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=128,
                               interpret=True)
    t, i = np.asarray(t), np.asarray(i)
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(t[1], 4.0, rtol=1e-6)   # boundary hit kept
    assert not np.isfinite(t[2]) and not np.isfinite(t[3])
    assert i[2] == -1 and i[3] == -1


def test_sorted_sweep_matches_unsorted(monkey, monkeypatch):
    """The sweep-local coherence sort (r5, intersect.coherent_sweep_order)
    permutes only the kernel inputs/outputs: hits, t's and ids must match
    the unsorted sweep exactly on a divergent, partially-dead batch."""
    from cge_tpu.ops import intersect

    monkeypatch.setattr(intersect, "FORCE_CLUSTER_INTERPRET", True)
    accel = intersect.build_accel(monkey)
    o, d = _rays(monkey, 20)
    N = o.shape[0]
    d = d.at[::2].mul(-1.0)                       # scatter directions
    tmax = jnp.where(jnp.arange(N) % 3 == 0, -1.0, jnp.inf)  # dead third
    a = intersect.closest_hit(monkey, o, d, tmax, accel=accel,
                              sort_rays=False)
    b = intersect.closest_hit(monkey, o, d, tmax, accel=accel,
                              sort_rays=True)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hh = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(b.t)[hh], np.asarray(a.t)[hh],
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(b.prim)[hh],
                                  np.asarray(a.prim)[hh])
    sh = jnp.where(tmax > 0, 1.0, -1.0)
    ah = intersect.any_hit_occlusion(monkey, o, d, sh, accel=accel,
                                     sort_rays=False)
    bh = intersect.any_hit_occlusion(monkey, o, d, sh, accel=accel,
                                     sort_rays=True)
    np.testing.assert_array_equal(np.asarray(ah), np.asarray(bh))


def test_any_hit_occlusion_reversed_matches_closest(cornell, monkeypatch):
    """The reversed TRIANGLE shadow sweep (origin at the light, r4,
    requested via tri_rays) must agree with forward closest-hit occlusion
    over the same budget-1 segments — exercised through any_hit_occlusion's
    cluster path in interpreter mode via FORCE_CLUSTER_INTERPRET."""
    from cge_tpu.ops import intersect

    monkeypatch.setattr(intersect, "FORCE_CLUSTER_INTERPRET", True)
    accel = intersect.build_accel(cornell)
    o, d = _rays(cornell, 12)
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
    ids = intersect.closest_hit(cornell, o, d, tmax, accel=accel)
    hit = np.asarray(ids.hit)
    dhat = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tn = jnp.where(ids.hit, ids.t, 0.0) * jnp.linalg.norm(d, axis=-1)
    p = o + dhat * (tn - 1e-5)[:, None]
    light = jnp.asarray([0.0, 0.58, 0.0], jnp.float32)
    sdir = light[None, :] - p
    stm = jnp.where(ids.hit, 1.0, -1.0)
    # forward truth via closest hit on the same segments
    fwd = intersect.closest_hit(cornell, p, sdir, stm, accel=accel).hit
    plain = intersect.any_hit_occlusion(cornell, p, sdir, stm, accel=accel)
    # the production shadow-path orientation: forward rays + the reversed
    # triangle parameterization (cge_tpu.render.lights.shadow_visibility)
    rev = intersect.any_hit_occlusion(
        cornell, p, sdir, stm, accel=accel,
        tri_rays=(jnp.broadcast_to(light[None, :], p.shape),
                  p - light[None, :]))
    np.testing.assert_array_equal(np.asarray(fwd)[hit],
                                  np.asarray(plain)[hit])
    np.testing.assert_array_equal(np.asarray(fwd)[hit],
                                  np.asarray(rev)[hit])


def test_any_hit_occlusion_sphere_not_reversed(monkeypatch):
    """ADVICE r4 (high): the sphere occlusion test is NOT invariant under
    ray reversal — the a==1 quadratic quirk (unnormalized |d|, mirroring
    the prebuilt kernel the reference links) produces direction-dependent
    fake roots. Constructed case: p at the origin, light sample 2 units
    away, a r=1.5 sphere centered 4 units out. Forward (reference
    semantics) the fake root DL^2 - sqrt(r^2 + D^2 L^4 - D^2 L^2)
    = 8 - sqrt(50.25) ~ 0.91 < 1 => BLOCKED, even though the segment never
    touches the sphere; reversed, both fake roots are negative => visible.
    any_hit_occlusion with tri_rays reversed must still block (spheres
    always test the forward rays)."""
    import dataclasses

    from cge_tpu.ops import intersect

    monkeypatch.setattr(intersect, "FORCE_CLUSTER_INTERPRET", True)
    base = load_scene_prebuilt(SceneType.CornellBox)
    S = base.sph_center.shape[0]
    scene = dataclasses.replace(
        base,
        sph_center=jnp.zeros((S, 3), jnp.float32)
        .at[0].set(jnp.asarray([0.0, 5.0, 4.0])),
        sph_radius=jnp.zeros((S,), jnp.float32).at[0].set(1.5),
        sph_mask=jnp.zeros((S,), bool).at[0].set(True))
    accel = intersect.build_accel(scene)
    # the segment sits at y = 5, well clear of the (unit-normalized)
    # Cornell geometry, so only the sphere can decide the query
    p = jnp.asarray([[0.0, 5.0, 0.0]], jnp.float32)
    light = jnp.asarray([[0.0, 5.0, 2.0]], jnp.float32)
    stm = jnp.ones(1, jnp.float32)
    # forward reference truth: the quirky closest-hit blocks
    fwd = intersect.closest_hit(scene, p, light - p, stm, accel=accel)
    assert bool(np.asarray(fwd.hit)[0]) and bool(np.asarray(fwd.is_sphere)[0])
    blocked = intersect.any_hit_occlusion(
        scene, p, light - p, stm, accel=accel, tri_rays=(light, p - light))
    assert bool(np.asarray(blocked)[0]), \
        "sphere occlusion must use the forward parameterization"
