"""Ray-primitive intersection ops.

Vectorized JAX re-implementations of the reference's prebuilt native
intersection library (API: /root/reference/src/intersect.h:5-16; semantics
reverse-engineered from the prebuilt archive — see SURVEY.md §2.1 and the
golden harness in tools/golden_intersect.cpp which validates these against
the actual binary):

  - trianglePlane: n = normalize(cross(v1-v0, v2-v0)), D = dot(n, v0)
  - pointInTriangle: three edge sign tests dot(cross(edge_i, p-v_i), n) >= 0
  - intersectRayWithPlane: t = (D - dot(n,o)) / dot(n,d); accept iff
    0 <= t <= ray.t
  - intersectRayWithTriangle: plane-then-point-in-triangle
  - sphere: quadratic with a == 1 (assumes normalized direction), smallest
    non-negative root, accept iff t < ray.t (strict)
  - AABB: slab test; origin-inside-box (tnear < 0 < tfar) accepts with
    t = tfar, else requires tnear >= 0 (and tnear <= ray.t)

All functions are mask-based (no data-dependent control flow) so they run on
the VPU with no divergence, vmap/shard_map cleanly, and are differentiable.

Closest-hit selection replicates the reference's sequential "last accepted
wins" rule (bounding_volume_hierarchy.cpp:272-293): triangles accept
t <= ray.t, so on exact ties the *later* triangle wins; spheres accept
strictly t < ray.t, so the *earlier* sphere wins and a sphere never displaces
an equal-t triangle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) scalars: a jnp constant at import time would initialize
# the XLA backend, which must not happen before jax.distributed.initialize
# in multi-host processes (tests/multihost_worker.py)
FLT_MAX = np.float32(3.4028234663852886e38)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def triangle_plane(v0, v1, v2):
    """trianglePlane: n = normalize(cross(v1-v0, v2-v0)), D = dot(n, v0).

    Grad-safe at degenerate triangles (zero cross product — pad rows of
    padded triangle tables): reverse-mode through v/|v| at |v| = 0 emits
    NaN into the VERTEX gradients even under a zero cotangent. Results for
    non-degenerate triangles are bit-identical."""
    n = jnp.cross(v1 - v0, v2 - v0)
    n2 = jnp.sum(n * n, axis=-1, keepdims=True)
    pos = n2 > 0
    n = jnp.where(pos, n / jnp.sqrt(jnp.where(pos, n2, 1.0)), 0.0)
    return n, _dot(n, v0)


def point_in_triangle(v0, v1, v2, n, p):
    """Three edge sign tests, all >= 0."""
    e0 = _dot(jnp.cross(v1 - v0, p - v0), n) >= 0
    e1 = _dot(jnp.cross(v2 - v1, p - v1), n) >= 0
    e2 = _dot(jnp.cross(v0 - v2, p - v2), n) >= 0
    return e0 & e1 & e2


def intersect_ray_plane_t(o, d, n, D):
    """Plane parameter t (no acceptance test)."""
    return (D - _dot(n, o)) / _dot(n, d)


def intersect_triangles_t(o, d, tmax, v0, v1, v2):
    """Batched ray x triangle test.

    o, d: [R, 3]; tmax: [R]; v0/v1/v2: [T, 3].
    Returns t: [R, T] with +inf where there is no acceptable hit
    (accept: 0 <= t <= tmax, point-in-triangle, finite).
    """
    n, D = triangle_plane(v0, v1, v2)                      # [T,3], [T]
    # precision=HIGHEST: on TPU these [R,3]x[3,T] contractions hit the MXU,
    # which defaults to bf16 and quantizes t to ~1e-2 relative — enough to
    # pick wrong triangles. HIGHEST forces f32-accurate passes.
    hi = jax.lax.Precision.HIGHEST
    denom = jnp.matmul(d, n.T, precision=hi)               # [R,T] = dot(d, n)
    t = (D[None, :] - jnp.matmul(o, n.T, precision=hi)) / denom
    p = o[:, None, :] + t[..., None] * d[:, None, :]       # [R,T,3]
    inside = point_in_triangle(v0[None], v1[None], v2[None], n[None], p)
    ok = (t >= 0) & (t <= tmax[:, None]) & inside & jnp.isfinite(t)
    return jnp.where(ok, t, jnp.inf)


def intersect_spheres_t(o, d, tmax, center, radius):
    """Batched ray x sphere; assumes |d| == 1 (quadratic a==1, like the
    prebuilt kernel). Returns t: [R, S], +inf on miss.
    Accept: disc >= 0, smallest non-negative root, t < tmax (strict)."""
    oc = o[:, None, :] - center[None, :, :]                # [R,S,3]
    b = 2.0 * _dot(d[:, None, :], oc)                      # [R,S]
    c = _dot(oc, oc) - radius[None, :] ** 2                # [R,S]
    disc = b * b - 4.0 * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / 2.0
    t1 = (-b + sq) / 2.0
    t = jnp.where(t0 >= 0, t0, t1)                          # smallest non-negative
    ok = (disc >= 0) & (t >= 0) & (t < tmax[:, None])
    return jnp.where(ok, t, jnp.inf)


FLT_MIN = np.float32(1.1754943508222875e-38)


def intersect_aabb(o, d, tmax, lower, upper):
    """Batched ray x AABB slab test — bit-exact to the prebuilt kernel
    (semantics decoded from the disassembly of intersect.cpp.o and validated
    by tests/test_intersect_golden.py):

      - per axis: t_l = (lower-o)/d, t_u = (upper-o)/d; when d == 0 the
        binary substitutes the *constants* t_l = FLT_MIN, t_u = FLT_MAX
        (so a parallel ray passes the slab even with the origin outside it
        — an authoritative quirk);
      - tnear = max_axis min(t_l, t_u); tfar = min_axis max(t_l, t_u);
      - tnear < 0: hit iff tfar > 0, reporting t = tfar (origin inside);
        else: hit iff tnear <= tfar, reporting t = tnear;
      - in both cases the reported t must satisfy t <= ray.t.

    o, d: [R, 3]; lower/upper: [B, 3]. Returns (hit [R,B], t [R,B])."""
    zero_dir = (d == 0)[:, None, :]
    safe_d = jnp.where(zero_dir, 1.0, d[:, None, :])
    t_l = (lower[None] - o[:, None, :]) / safe_d            # [R,B,3]
    t_u = (upper[None] - o[:, None, :]) / safe_d
    t_l = jnp.where(zero_dir, FLT_MIN, t_l)
    t_u = jnp.where(zero_dir, FLT_MAX, t_u)
    tlo = jnp.minimum(t_l, t_u)
    thi = jnp.maximum(t_l, t_u)
    tnear = jnp.max(tlo, axis=-1)
    tfar = jnp.min(thi, axis=-1)
    inside = tnear < 0
    t = jnp.where(inside, tfar, tnear)
    ok = jnp.where(inside, tfar > 0, tnear <= tfar)
    hit = ok & (t >= 0) & (t <= tmax[:, None])
    return hit, t


class HitIds(NamedTuple):
    """Discrete result of closest-hit: which primitive, at what t."""

    hit: jax.Array        # [R] bool
    t: jax.Array          # [R] f32 (inf on miss)
    is_sphere: jax.Array  # [R] bool
    prim: jax.Array       # [R] i32 (triangle index or sphere index)


class Accel(NamedTuple):
    """Device-side acceleration structure: the cluster permutation plus the
    packed Pallas tile stack (built once per trace, reused by every bounce
    and shadow sweep). Entirely under stop_gradient — hit *selection* is
    discrete; differentiable quantities are recomputed from the ids
    (cge_tpu.render.wavefront.hit_attributes)."""

    perm: jax.Array   # [L, C] i32 triangle ids, -1 pad
    aabbs: jax.Array  # [L, 8] f32 cluster AABBs (lo3, hi3, pad2)
    tiles: jax.Array  # f32 packed triangle constants: triangle-major
    #                   [L, C, 16] (VMEM-resident) or field-major
    #                   [L, 16, C] (HBM/DMA) — see pack_cluster_tiles


def build_accel(scene) -> Accel:
    """Pack the scene's cluster accel for the Pallas culled sweep."""
    from cge_tpu.ops.pallas.cluster_sweep import pack_cluster_tiles
    sg = jax.lax.stop_gradient
    perm = scene.cluster_perm
    aabbs, tiles = pack_cluster_tiles(sg(scene.vertices), scene.tris, perm)
    return Accel(perm=perm, aabbs=aabbs, tiles=tiles)


def coherent_sweep_order(point, d, tmax):
    """Sweep-local coherence permutation for DIVERGENT ray batches:
    alive-first, bucketed by direction octant, STABLE within buckets.
    Returns (order, inv) [N] i32.

    Rationale (r5): the cluster sweep's per-block work scales with the
    block's plausible cluster corridor. Bounce-level wavefronts are 2-20%
    alive and direction-scattered, so scan-order 512-ray blocks each pay a
    wide corridor on HBM-streamed scenes (6.2 ms/call on the 614k dragon,
    PERF_r05.md). Permuting ONLY around the kernel call (inputs permuted,
    outputs unpermuted; the shading state never moves — r4's losing
    variant permuted the whole scan carry) packs dead rays into skipped
    blocks and groups live rays by octant.

    Implementation is a 9-bucket COUNTING permutation (a [N, 9] cumsum +
    one scatter), NOT an argsort: a 65k argsort costs multiple ms on TPU
    (bitonic) and measured a net frame LOSS; the cumsum is ~100x cheaper.
    Stability preserves the parent level's tile-swizzle coherence inside
    each bucket — better locality than a morton re-sort. `point` is kept
    in the signature for future locality keys."""
    del point
    N = d.shape[0]
    live = tmax >= 0
    octant = ((d[:, 0] > 0).astype(jnp.int32) * 4
              + (d[:, 1] > 0).astype(jnp.int32) * 2
              + (d[:, 2] > 0).astype(jnp.int32))
    bucket = jnp.where(live, octant, 8)                    # dead last
    onehot = (bucket[:, None] == jnp.arange(9)[None, :]).astype(jnp.int32)
    within = jnp.cumsum(onehot, axis=0) - 1                # [N, 9] inclusive
    totals = jnp.sum(onehot, axis=0)                       # [9]
    offsets = jnp.cumsum(totals) - totals                  # exclusive [9]
    pos = (jnp.take_along_axis(within, bucket[:, None], axis=1)[:, 0]
           + offsets[bucket])                              # target slot = inv
    order = jnp.zeros(N, jnp.int32).at[pos].set(
        jnp.arange(N, dtype=jnp.int32))
    return order, pos


def _closest_tris_sweep(o, d, tmax, vertices, tris, mask, tri_tile: int,
                        idx_offset=0):
    """Scan over triangle tiles; returns (t [R], idx [R]) with last-wins ties.
    idx_offset shifts reported indices (for sharded sweeps over a slice)."""
    T = tris.shape[0]
    n_tiles = -(-T // tri_tile)
    pad = n_tiles * tri_tile - T
    tris = jnp.pad(tris, ((0, pad), (0, 0)))
    mask = jnp.pad(mask, (0, pad))
    v = vertices

    def body(carry, tile_idx):
        best_t, best_i = carry
        s = tile_idx * tri_tile
        tt = jax.lax.dynamic_slice_in_dim(tris, s, tri_tile, 0)
        tm = jax.lax.dynamic_slice_in_dim(mask, s, tri_tile, 0)
        v0 = v[tt[:, 0]]
        v1 = v[tt[:, 1]]
        v2 = v[tt[:, 2]]
        t = intersect_triangles_t(o, d, tmax, v0, v1, v2)   # [R, tile]
        t = jnp.where(tm[None, :], t, jnp.inf)
        tmin = jnp.min(t, axis=1)                            # [R]
        ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) + (s + idx_offset)
        idx = jnp.max(jnp.where(t == tmin[:, None], ids, -1), axis=1)
        # sequential last-wins: a later tile replaces on t <= best
        take = (tmin <= best_t) & jnp.isfinite(tmin)
        return (jnp.where(take, tmin, best_t), jnp.where(take, idx, best_i)), None

    R = o.shape[0]
    init = (jnp.full(R, jnp.inf, jnp.float32), jnp.full(R, -1, jnp.int32))
    (best_t, best_i), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return best_t, best_i


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# Test/dryrun hook: when True, the cluster-sweep Pallas path also runs
# off-TPU in interpreter mode, so the prims-sharded accel branch can be
# validated on a virtual CPU mesh (tests/test_sharding.py,
# __graft_entry__.dryrun_multichip) without real chips.
FORCE_CLUSTER_INTERPRET = False


def _cluster_active(accel) -> bool:
    return accel is not None and (_on_tpu() or FORCE_CLUSTER_INTERPRET)


def uses_cluster_sweep(accel, prims_axis) -> bool:
    """Single source of truth for "closest_hit takes the cluster-sweep
    Pallas path" — and therefore for which id-space its hit ids live in
    (perm-space when the caller asks for perm_ids). wavefront._perm_tables
    keys its attribute-table layout off this same predicate, so the two can
    never drift (a drift would silently shade with wrong attributes).

    Since r4 the predicate no longer excludes prims-sharded sweeps: the TP
    branch shards superclusters and reports GLOBAL perm-space flat ids, so
    the same globally-permuted attribute tables apply (prims_axis is kept
    in the signature as documentation of that contract)."""
    del prims_axis
    return _cluster_active(accel)


def closest_hit(scene, o, d, tmax, tri_tile: int = 512,
                prims_axis=None, prims_axis_size: int = 1,
                use_pallas=None, accel: Accel | None = None,
                shared_origin: bool = False, br: int = 512,
                exact_keys: bool = True, perm_ids: bool = False,
                sc_n: int | None = None,
                sort_rays: bool = False) -> HitIds:
    """Closest hit over all primitives of the scene.

    Replicates the reference's acceptance + tie rules (see module docstring).
    Triangle t is in units of |d| (the kernels never normalize); sphere t
    assumes |d| == 1.

    When `accel` is given (and on TPU), the cluster-culled Pallas sweep is
    used: identical accept rules, but exact-t ties resolve in cluster order
    instead of scene order — the same class of divergence the reference's own
    BVH-on traversal has vs its brute loop (SURVEY.md §2.5 #11). On non-TPU
    backends accel falls back to the brute sweep.

    When prims_axis is set (inside shard_map over a mesh axis of size
    prims_axis_size — the tensor-parallel analogue), each device sweeps a
    contiguous slice of the (replicated) triangle table and the partial
    results are combined with an all_gather + tie-aware reduction over ICI;
    spheres are small and processed replicated after the reduce.
    """
    if use_pallas is None:
        use_pallas = _on_tpu()
    # closest-hit is a discrete selection oracle: every differentiable
    # quantity is recomputed from the returned ids by the caller, so the ray
    # inputs AND the geometry tables carry stop_gradient (also keeps the
    # non-differentiable Pallas kernels out of JVP traces, and keeps
    # degenerate pad rows' NaN-producing backward — normalize/sqrt at 0 —
    # out of the vertex/sphere gradients entirely; r5 transrec grad test).
    sg = jax.lax.stop_gradient
    o, d, tmax = sg(o), sg(d), sg(tmax)
    verts = sg(scene.vertices)

    def sweep(tris, mask, idx_offset):
        if use_pallas:
            from cge_tpu.ops.pallas.sweep import (pack_tri_table,
                                                  pallas_closest_tris)
            table = pack_tri_table(verts, tris, mask)
            t, i = pallas_closest_tris(o, d, tmax, table)
            return t, jnp.where(i >= 0, i + idx_offset, i)
        return _closest_tris_sweep(o, d, tmax, verts, tris, mask,
                                   tri_tile, idx_offset=idx_offset)

    interp = FORCE_CLUSTER_INTERPRET and not _on_tpu()
    if accel is not None and (use_pallas or interp) and prims_axis is None:
        # == uses_cluster_sweep(accel, prims_axis) whenever use_pallas was
        # defaulted (the only way render paths call this)
        from cge_tpu.ops.pallas.cluster_sweep import pallas_cluster_tris
        if sort_rays:
            # sweep-local coherence permutation (divergent bounce batches;
            # see coherent_sweep_order). Ties resolve in the permuted visit
            # order — the same documented divergence class as block order.
            order, inv = coherent_sweep_order(o, d, tmax)
            t_s, i_s = pallas_cluster_tris(
                o[order], d[order], tmax[order], accel.aabbs, accel.tiles,
                accel.perm, br=br, exact_keys=exact_keys,
                shared_origin=False, perm_ids=perm_ids, sc_n=sc_n,
                interpret=interp)
            best_t, best_i = t_s[inv], i_s[inv]
        else:
            best_t, best_i = pallas_cluster_tris(o, d, tmax, accel.aabbs,
                                                 accel.tiles, accel.perm,
                                                 br=br,
                                                 exact_keys=exact_keys,
                                                 shared_origin=shared_origin,
                                                 perm_ids=perm_ids,
                                                 sc_n=sc_n,
                                                 interpret=interp)
    elif accel is not None and (use_pallas or interp):
        # prims-sharded cluster sweep (the TP analogue, SURVEY.md §2.3):
        # superclusters — not raw triangles — are sharded across the mesh
        # axis, so every device keeps the Pallas accel branch. Each shard
        # sweeps its cluster slice, reports ids as GLOBAL perm-space flat
        # slots (local slot + cluster offset), and the partials combine
        # with an all_gather + tie-aware reduce over ICI. Exact-t ties
        # resolve to the largest global perm slot — the same documented
        # divergence class as the single-device kernel's visit-order ties.
        from cge_tpu.ops.pallas.cluster_sweep import (pad_cluster_stack,
                                                      pallas_cluster_tris)
        L, C = accel.perm.shape
        P = prims_axis_size
        Lp = -(-L // P) * P
        aabbs, tiles, permc = accel.aabbs, accel.tiles, accel.perm
        if Lp != L:
            padL = Lp - L
            aabbs, tiles = pad_cluster_stack(aabbs, tiles, padL)
            permc = jnp.concatenate(
                [permc, jnp.full((padL, C), -1, jnp.int32)], axis=0)
        shard = Lp // P
        ax = jax.lax.axis_index(prims_axis)
        ab_l = jax.lax.dynamic_slice_in_dim(aabbs, ax * shard, shard, 0)
        tl_l = jax.lax.dynamic_slice_in_dim(tiles, ax * shard, shard, 0)
        pm_l = jax.lax.dynamic_slice_in_dim(permc, ax * shard, shard, 0)
        t_l, f_l = pallas_cluster_tris(o, d, tmax, ab_l, tl_l, pm_l,
                                       br=br, exact_keys=exact_keys,
                                       shared_origin=shared_origin,
                                       perm_ids=True, sc_n=sc_n,
                                       interpret=interp)
        f_g = jnp.where(f_l >= 0, f_l + ax * shard * C, -1)
        ts = jax.lax.all_gather(t_l, prims_axis)             # [P, R]
        fs = jax.lax.all_gather(f_g, prims_axis)
        best_t = jnp.min(ts, axis=0)
        best_flat = jnp.max(jnp.where(ts == best_t[None, :], fs, -1), axis=0)
        if perm_ids:
            best_i = best_flat
        else:
            best_i = jnp.where(
                best_flat >= 0,
                accel.perm.reshape(-1)[jnp.maximum(
                    jnp.minimum(best_flat, L * C - 1), 0)], -1)
    elif prims_axis is not None:
        T = scene.tris.shape[0]
        assert T % prims_axis_size == 0, "pad tris to a multiple of the axis"
        shard = T // prims_axis_size
        ax = jax.lax.axis_index(prims_axis)
        tris_l = jax.lax.dynamic_slice_in_dim(scene.tris, ax * shard, shard, 0)
        mask_l = jax.lax.dynamic_slice_in_dim(scene.tri_mask, ax * shard, shard, 0)
        t_l, i_l = sweep(tris_l, mask_l, ax * shard)
        ts = jax.lax.all_gather(t_l, prims_axis)             # [P, R]
        idxs = jax.lax.all_gather(i_l, prims_axis)           # [P, R]
        best_t = jnp.min(ts, axis=0)
        # largest global triangle index wins exact-t ties (last-wins rule)
        best_i = jnp.max(jnp.where(ts == best_t[None, :], idxs, -1), axis=0)
    else:
        best_t, best_i = sweep(scene.tris, scene.tri_mask, 0)

    # spheres: tested after all triangles (ctor order,
    # bounding_volume_hierarchy.cpp:158-171); accept strictly < current best.
    sph_budget = jnp.minimum(best_t, tmax)
    ts = intersect_spheres_t(o, d, sph_budget, sg(scene.sph_center),
                             sg(scene.sph_radius))
    ts = jnp.where(scene.sph_mask[None, :], ts, jnp.inf)
    ts_min = jnp.min(ts, axis=1)
    S = ts.shape[1]
    sids = jax.lax.broadcasted_iota(jnp.int32, ts.shape, 1)
    s_idx = jnp.min(jnp.where(ts == ts_min[:, None], sids, S + 1), axis=1)
    sphere_wins = jnp.isfinite(ts_min)   # already strictly < best_t by budget

    t = jnp.where(sphere_wins, ts_min, best_t)
    hit = jnp.isfinite(t)
    prim = jnp.where(sphere_wins, s_idx.astype(jnp.int32), best_i)
    return HitIds(hit=hit, t=t, is_sphere=sphere_wins, prim=jnp.where(hit, prim, 0))


def closest_hit_chunked(scene, o, d, tmax, ray_chunk: int = 2048,
                        tri_tile: int = 512, prims_axis=None,
                        prims_axis_size: int = 1,
                        accel: Accel | None = None,
                        shared_origin: bool = False, br: int = 512,
                        exact_keys: bool = True,
                        perm_ids: bool = False,
                        sc_n: int | None = None,
                        sort_rays: bool = False) -> HitIds:
    """Memory-bounded closest hit.

    On TPU the Pallas sweep kernel bounds VMEM via its own grid, so the
    whole ray batch goes through in one call; the XLA fallback (CPU/GPU)
    pads rays to a multiple of ray_chunk and lax.map's chunks through
    `closest_hit` to bound the [rays, tri_tile] intermediates."""
    if _on_tpu() or (FORCE_CLUSTER_INTERPRET and accel is not None):
        return closest_hit(scene, o, d, tmax, tri_tile,
                           prims_axis, prims_axis_size,
                           use_pallas=_on_tpu(),
                           accel=accel, shared_origin=shared_origin,
                           br=br, exact_keys=exact_keys,
                           perm_ids=perm_ids and accel is not None,
                           sc_n=sc_n, sort_rays=sort_rays)
    R = o.shape[0]
    n_chunks = max(1, -(-R // ray_chunk))
    pad = n_chunks * ray_chunk - R
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)))
    tmax_p = jnp.pad(tmax, (0, pad), constant_values=-1.0)  # dead rays

    def run(chunk):
        oo, dd, tt = chunk
        return closest_hit(scene, oo, dd, tt, tri_tile,
                           prims_axis, prims_axis_size, use_pallas=False)

    res = jax.lax.map(run, (o_p.reshape(n_chunks, ray_chunk, 3),
                            d_p.reshape(n_chunks, ray_chunk, 3),
                            tmax_p.reshape(n_chunks, ray_chunk)))
    return HitIds(*(x.reshape(-1)[:R] for x in res))


def any_hit_occlusion(scene, o, d, tmax, accel: Accel | None = None,
                      br: int = 512, exact_keys: bool = True,
                      tri_rays=None, sc_n: int | None = None,
                      sort_rays: bool = False):
    """Occlusion query: True where *any* primitive blocks the ray within its
    t budget (light.cpp:60-63 when transparency is off — the caller only
    needs existence, not which blocker). On TPU with an accel this runs the
    Pallas any-hit kernel, where a blocked ray prunes all remaining clusters;
    elsewhere it falls back to closest-hit.

    tri_rays: optional (o2, d2) alternative parameterization of the SAME
    segments, used only for the triangle cluster sweep. The shadow path
    passes the reversed budget-1 query (origin at the light sample — gives
    every ray block a tight origin hull, measured 22% faster, PERF_r04.md).
    Triangle acceptance (plane t in [0, budget] + point-in-triangle) is
    invariant under that reversal, but the sphere quadratic's a==1 quirk
    (unnormalized |d|) is NOT — e.g. a sphere just beyond the light can
    block forward yet clear reversed (ADVICE r4) — so spheres and every
    fallback path always test the forward (o, d)."""
    sg = jax.lax.stop_gradient
    o, d, tmax = sg(o), sg(d), sg(tmax)
    if _cluster_active(accel):
        from cge_tpu.ops.pallas.cluster_sweep import pallas_cluster_tris
        to, td = (sg(tri_rays[0]), sg(tri_rays[1])) if tri_rays else (o, d)
        if sort_rays:
            # sort by the VARYING endpoint: the surface point — to itself
            # for forward shadow rays, to + td (budget-1 segments) when the
            # triangle query runs reversed from the light sample
            point = (to + td) if tri_rays else to
            order, inv = coherent_sweep_order(point, td, tmax)
            hit_s, _ = pallas_cluster_tris(
                to[order], td[order], tmax[order], accel.aabbs, accel.tiles,
                accel.perm, br=br, exact_keys=exact_keys, any_hit=True,
                sc_n=sc_n, interpret=not _on_tpu())
            tri_hit = hit_s[inv]
        else:
            tri_hit, _ = pallas_cluster_tris(to, td, tmax, accel.aabbs,
                                             accel.tiles, accel.perm,
                                             br=br, exact_keys=exact_keys,
                                             any_hit=True, sc_n=sc_n,
                                             interpret=not _on_tpu())
        ts = intersect_spheres_t(o, d, tmax, sg(scene.sph_center),
                                 sg(scene.sph_radius))
        ts = jnp.where(scene.sph_mask[None, :], ts, jnp.inf)
        return tri_hit | jnp.isfinite(jnp.min(ts, axis=1))
    return closest_hit_chunked(scene, o, d, tmax, accel=accel,
                               br=br, exact_keys=exact_keys).hit


@functools.partial(jax.jit, static_argnames=())
def normalize(v, axis=-1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)
