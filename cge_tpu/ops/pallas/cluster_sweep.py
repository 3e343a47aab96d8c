"""Pallas TPU kernel: cluster-culled closest-hit / any-hit sweep.

The TPU-native acceleration structure. Triangles are pre-permuted into
spatially-coherent clusters of CLUSTER_SIZE (cge_tpu.ops.bvh.build_clusters)
and traversal is split to play to each engine's strength:

  1. an XLA pre-pass slab-tests every (ray block, cluster) pair — massively
     parallel, no serial chains — producing each block's front-to-back
     cluster visit order and entry keys (argsort over ~a hundred keys);
  2. one grid program per ray block walks its visit order from SMEM and
     runs dense, divergence-free [C, BR] VPU intersection tiles, stopping
     as soon as the next cluster's entry t is behind every live ray's
     current best (a triangle's t is >= its cluster's entry t, so ordered
     visiting makes the stop exact, like a BVH's ordered traversal).

The serial loop therefore runs ~|plausible set| iterations with a single
scalar reduction each — versus a per-(block, cluster) grid (launch overhead
dominated at tens of thousands of programs) or an in-kernel argmin loop
(multiple serializing reductions per cluster).

Triangle data is packed as precomputed plane + edge-plane constants
(16 lanes: n, D, then m_i = cross(n, edge_i), b_i = dot(m_i, v_i) for the
three edges): the reference's pointInTriangle edge test
dot(cross(edge_i, p - v_i), n) >= 0 equals dot(m_i, p) - b_i >= 0 by the
scalar-triple-product identity, and p = o + t*d turns it into two dot
products — ~25% fewer VPU ops per pair than materializing p and the cross
products, with no per-pair gathers.

Modes:
  - closest (default): reference accept rules (0 <= t <= budget), last
    accepted wins on exact ties *in visit order* — the same class of tie
    divergence as the reference's own BVH-on traversal
    (bounding_volume_hierarchy.cpp:312-362) vs its brute loop.
  - any_hit: occlusion query; a ray that accepts any triangle is marked done
    (best_t = DONE) and stops contributing to the stop bound. Used for
    shadow rays when the transparency feature is off (light.cpp:60-63 only
    needs *a* blocker then).
  - shared_origin: static promise that all rays share one origin (primary
    pinhole rays): hoists the o-dot products out of the pair loop
    ([C, 1] instead of [C, BR]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cge_tpu.ops.bvh import CLUSTER_SIZE

DEFAULT_BR = 512
# max clusters per grid group: bounds the VMEM tile-stack block
DEFAULT_GROUP = 512
FLT_MAX = 3.4028234663852886e38  # python float: jnp scalars would be captured consts
_DONE = -3.0e38                  # any-hit sentinel: stops visiting for that ray


def pack_cluster_tiles(vertices, tris, perm):
    """Build the packed cluster constants inside jit.

    perm: [L, C] int32 triangle ids (-1 = pad). Returns:
      aabbs [L, 8] f32 — lanes 0:3 cluster AABB lower, 3:6 upper, 2 pad;
      tiles [L, C, 16] f32 — per-triangle plane + edge-plane constants:
        lanes (nx, ny, nz, D, m0, b0, m1, b1, m2, b2) with m_i 3-wide.
    Invalid (pad) triangles get all-zero constants with b_i = 1, which makes
    every edge test fail (s_i = -1 < 0) — no separate valid lane needed.
    """
    L, C = perm.shape
    safe = jnp.maximum(perm, 0)
    tv = vertices[tris[safe]]                # [L, C, 3, 3]
    v0, v1, v2 = tv[:, :, 0], tv[:, :, 1], tv[:, :, 2]
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    D = jnp.sum(n * v0, axis=-1)
    valid = perm >= 0

    def edge_consts(va, vb):
        m = jnp.cross(n, vb - va)
        b = jnp.sum(m * va, axis=-1)
        return m, b

    m0, b0 = edge_consts(v0, v1)
    m1, b1 = edge_consts(v1, v2)
    m2, b2 = edge_consts(v2, v0)

    tri_rows = jnp.stack([
        n[..., 0], n[..., 1], n[..., 2], D,
        m0[..., 0], m0[..., 1], m0[..., 2], b0,
        m1[..., 0], m1[..., 1], m1[..., 2], b1,
        m2[..., 0], m2[..., 1], m2[..., 2], b2], axis=-1)   # [L, C, 16]
    # pad triangles: zero constants, b = 1 => edge tests always fail
    inval = jnp.array([0.] * 4 + [0., 0., 0., 1.] * 3, jnp.float32)
    tri_rows = jnp.where(valid[..., None], tri_rows, inval)

    # cluster AABBs over valid triangles; empty clusters land at +inf lower
    # (slab entry t = +inf => never visited)
    big = jnp.where(valid[..., None, None], tv, jnp.inf)
    small = jnp.where(valid[..., None, None], tv, -jnp.inf)
    lo = big.min(axis=(1, 2))                          # [L, 3]
    hi = small.max(axis=(1, 2))
    aabbs = jnp.concatenate([lo, hi, jnp.zeros((L, 2))], axis=1)  # [L, 8]
    return aabbs.astype(jnp.float32), tri_rows.astype(jnp.float32)


def _entry_slab(rays, lo_cols, hi_cols):
    """Per-(cluster, ray) slab entry t within budget: [L?, BR], inf = miss.

    rays: [8, BR] packed block; lo_cols/hi_cols: three [L?, 1] column pairs.
    """
    o = (rays[0:1], rays[1:2], rays[2:3])
    d = (rays[3:4], rays[4:5], rays[5:6])
    tm = rays[6:7]
    tnear, tfar = None, None
    for ax in range(3):
        nz = d[ax] != 0
        inv = jnp.where(nz, 1.0 / jnp.where(nz, d[ax], 1.0), 0.0)
        t1 = (lo_cols[ax] - o[ax]) * inv
        t2 = (hi_cols[ax] - o[ax]) * inv
        t1 = jnp.where(nz, t1, -FLT_MAX)    # zero-dir: conservative pass
        t2 = jnp.where(nz, t2, FLT_MAX)
        a, b = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
        tnear = a if tnear is None else jnp.maximum(tnear, a)
        tfar = b if tfar is None else jnp.minimum(tfar, b)
    live = tm >= 0
    geo = (tnear <= tfar) & (tfar >= 0) & live & (tnear <= tm)
    return jnp.where(geo, jnp.maximum(tnear, 0.0), jnp.inf)


def _keys_kernel(ray_ref, aabb_ref, keys_ref):
    """Pass 1: per-block cluster entry keys [Lp, 1] (min over the block's
    rays). Vectorized VPU work only — no serial chains, and the [Lp, BR]
    intermediate lives in VMEM registers, never HBM."""
    rays = ray_ref[0]
    lo = tuple(aabb_ref[:, k:k + 1] for k in range(3))
    hi = tuple(aabb_ref[:, 3 + k:4 + k] for k in range(3))
    entry = _entry_slab(rays, lo, hi)                  # [Lp, BR]
    keys_ref[0] = jnp.min(entry, axis=1, keepdims=True)


def _block_entry_keys(rays, aabbs, interpret=False):
    """Per-block cluster entry keys [NB, Lp] via the pass-1 kernel."""
    NB = rays.shape[0]
    Lp = aabbs.shape[0]
    keys = pl.pallas_call(
        _keys_kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 8, rays.shape[2]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lp, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, Lp, 1), jnp.float32),
        interpret=interpret,
    )(rays, aabbs)
    return keys[:, :, 0]


def _cluster_kernel(order_ref, skey_ref, ray_ref, tile_ref,
                    best_t_ref, best_i_ref, *, c, lg, any_hit, shared_origin):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, jnp.inf)
        best_i_ref[:] = jnp.full_like(best_i_ref, -1)

    rays = ray_ref[0]                                 # [8, BR]
    o_x, o_y, o_z = rays[0:1], rays[1:2], rays[2:3]   # [1, BR]
    d_x, d_y, d_z = rays[3:4], rays[4:5], rays[5:6]
    tm = rays[6:7]
    live = tm >= 0

    def dense(pick):
        """One [C, BR] intersection tile against cluster `pick`."""
        tri = tile_ref[pl.ds(pick, 1), :, :][0]       # [C, 16]

        def col(k):
            return tri[:, k:k + 1]                    # [C, 1]

        nx, ny, nz, D = col(0), col(1), col(2), col(3)
        dn = d_x * nx + d_y * ny + d_z * nz           # [C, BR]
        if shared_origin:
            ox, oy, oz = o_x[0:1, 0:1], o_y[0:1, 0:1], o_z[0:1, 0:1]
        else:
            ox, oy, oz = o_x, o_y, o_z
        on = ox * nx + oy * ny + oz * nz              # [C, BR] or [C, 1]
        t = (D - on) / dn

        def edge_ok(k):
            mx, my, mz, b = col(4 * k + 4), col(4 * k + 5), \
                col(4 * k + 6), col(4 * k + 7)
            dm = d_x * mx + d_y * my + d_z * mz
            om = ox * mx + oy * my + oz * mz
            return (om - b) + t * dm >= 0

        inside = edge_ok(0) & edge_ok(1) & edge_ok(2)
        ok = (t >= 0) & (t <= tm) & inside
        prev_t = best_t_ref[0, 0:1, :]
        prev_i = best_i_ref[0, 0:1, :]
        if any_hit:
            hit = jnp.any(ok, axis=0, keepdims=True)          # [1, BR]
            new_t = jnp.where(hit, _DONE, prev_t)
            new_i = jnp.where(hit, 1, prev_i)
        else:
            t = jnp.where(ok, t, jnp.inf)
            tmin = jnp.min(t, axis=0, keepdims=True)          # [1, BR]
            base = ((j * lg + pick) * c).astype(jnp.float32)
            flat = base + jax.lax.broadcasted_iota(
                jnp.int32, (c, 1), 0).astype(jnp.float32)
            idx = jnp.max(jnp.where(t == tmin, flat, -1.0),
                          axis=0, keepdims=True).astype(jnp.int32)
            take = (tmin <= prev_t) & jnp.isfinite(tmin)
            new_t = jnp.where(take, tmin, prev_t)
            new_i = jnp.where(take, idx, prev_i)
        best_t_ref[0] = jnp.broadcast_to(new_t, best_t_ref.shape[1:])
        best_i_ref[0] = jnp.broadcast_to(new_i, best_i_ref.shape[1:])

    # front-to-back visit with exact stop: cluster k can improve some ray
    # iff its entry key <= max over live rays of min(best, budget); keys are
    # visited ascending, so the first failing key ends the whole block. The
    # x4 unroll amortizes the serializing scalar stop-check over four dense
    # tiles (at most 3 wasted tiles per block).
    unroll = min(4, lg)

    def cond(carry):
        step, stop = carry
        return jnp.logical_and(step < lg, jnp.logical_not(stop))

    def past(key, need):
        # no remaining cluster can help: next key behind every live ray's
        # need, or +inf (= no live ray enters it at all; note inf > inf is
        # False, so the explicit finiteness test is load-bearing for blocks
        # of unbounded-budget rays that miss everything)
        return jnp.logical_or(key > need, key >= FLT_MAX)

    def visit(carry):
        step, _ = carry
        for u in range(unroll):
            dense(order_ref[0, 0, jnp.minimum(step + u, lg - 1)])
        step = step + unroll
        prev_t = best_t_ref[0, 0:1, :]
        need = jnp.max(jnp.where(live, jnp.minimum(prev_t, tm), -jnp.inf))
        stop = jnp.logical_or(
            step >= lg, past(skey_ref[0, 0, jnp.minimum(step, lg - 1)], need))
        return step, stop

    # first-key guard: an all-dead / no-overlap block does zero visits
    need0 = jnp.max(jnp.where(live, tm, -jnp.inf))
    jax.lax.while_loop(cond, visit,
                       (jnp.int32(0), past(skey_ref[0, 0, 0], need0)))


@functools.partial(jax.jit, static_argnames=("br", "group", "any_hit",
                                             "shared_origin", "interpret"))
def pallas_cluster_tris(o, d, tmax, aabbs, tiles, perm, br=DEFAULT_BR,
                        group=DEFAULT_GROUP, any_hit=False,
                        shared_origin=False, interpret=False):
    """Cluster-accelerated triangle sweep.

    o, d: [R, 3]; tmax: [R] per-ray budget (-1 = dead ray);
    aabbs, tiles: from pack_cluster_tiles; perm: [L, C] cluster permutation.

    closest mode: returns (best_t [R], best_idx [R] — *scene* triangle ids,
    -1 on miss).  any_hit mode: returns (hit [R] bool, hit [R] bool) — no
    meaningful t.
    """
    R = o.shape[0]
    L, C, _ = tiles.shape
    Lg = min(group, L)
    G = -(-L // Lg)
    padL = G * Lg - L
    if padL:
        # far-away empty clusters: slab entry +inf, never visited
        aabbs = jnp.pad(aabbs, ((0, padL), (0, 0)),
                        constant_values=FLT_MAX)
        inval = jnp.array([0.] * 4 + [0., 0., 0., 1.] * 3, jnp.float32)
        tiles = jnp.concatenate(
            [tiles, jnp.broadcast_to(inval, (padL, C, 16))], axis=0)
    Rp = -(-R // br) * br

    def pad_r(x, fill=0.0):
        return jnp.pad(x, (0, Rp - R), constant_values=fill)

    rays = jnp.stack([
        pad_r(o[:, 0]), pad_r(o[:, 1]), pad_r(o[:, 2]),
        pad_r(d[:, 0]), pad_r(d[:, 1]), pad_r(d[:, 2]),
        pad_r(tmax, -1.0), jnp.zeros(Rp, jnp.float32)], axis=0)
    rays = rays.reshape(8, Rp // br, br).transpose(1, 0, 2)   # [NB, 8, BR]

    n_ray_blocks = Rp // br
    # per-(block, group) front-to-back visit order over the group's clusters
    keys = _block_entry_keys(rays, aabbs, interpret)   # [NB, G*Lg]
    keys = keys.reshape(n_ray_blocks, G, Lg)
    order = jnp.argsort(keys, axis=-1).astype(jnp.int32)
    skeys = jnp.take_along_axis(keys, order, axis=-1)

    best_t, best_i = pl.pallas_call(
        functools.partial(_cluster_kernel, c=C, lg=Lg, any_hit=any_hit,
                          shared_origin=shared_origin),
        grid=(n_ray_blocks, G),
        in_specs=[
            pl.BlockSpec((1, 1, Lg), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, Lg), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, br), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lg, C, 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 8, br), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, br), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_ray_blocks, 8, br), jnp.float32),
            jax.ShapeDtypeStruct((n_ray_blocks, 8, br), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=55 * Rp * L * C // 8,   # assume ~12% of tiles survive
            bytes_accessed=(Rp * 8 + L * C * 16 + L * 8) * 4,
            transcendentals=0),
        interpret=interpret,
    )(order, skeys, rays, tiles)
    best_t = best_t[:, 0, :].reshape(-1)[:R]
    flat = best_i[:, 0, :].reshape(-1)[:R]
    if any_hit:
        hit = flat > 0
        return hit, hit
    scene_ids = jnp.where(flat >= 0, perm.reshape(-1)[jnp.maximum(flat, 0)],
                          -1)
    return best_t, scene_ids
