"""Pallas TPU kernel: cluster-culled closest-hit sweep.

The brute-force sweep (cge_tpu.ops.pallas.sweep) tests every ray against
every triangle — VPU speed-of-light, but O(R*T). This kernel adds the
TPU-native acceleration structure: triangles are pre-permuted into
spatially-coherent clusters of CLUSTER_SIZE (cge_tpu.ops.bvh.build_clusters)
and each grid program first slab-tests its whole ray block against the
cluster's AABB, skipping the dense intersection tile entirely (predicated
execution, @pl.when) when no live ray can hit it — including rays whose
current best t is already closer than the cluster entry. For coherent
primary/shadow wavefronts this skips the vast majority of tiles.

Semantics: identical accept rules as the brute sweep; hit indices are
remapped through the cluster permutation, so exact-t ties resolve in
*cluster* order rather than scene order (same class of divergence as the
reference's own BVH-on traversal order, bounding_volume_hierarchy.cpp:312-362).

Cluster tile layout: [L, 8 + C, 16] f32 — 8 meta rows (row 0 lanes 0:3 =
AABB lower, 3:6 = upper) followed by C triangle rows packed like the brute
sweep's table, with lane 14 = the triangle's index within the cluster table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cge_tpu.ops.bvh import CLUSTER_SIZE

DEFAULT_BR = 512
FLT_MAX = 3.4028234663852886e38  # python float: jnp scalars would be captured consts in the kernel


def pack_cluster_tiles(vertices, tris, perm):
    """Build the [L, 8 + C, 16] cluster tile stack inside jit.

    perm: [L, C] int32 triangle ids (-1 = pad). Triangle rows follow the
    brute-sweep field layout; lane 13 = valid, lane 14 = flat cluster-table
    index (for hit-id remapping)."""
    L, C = perm.shape
    safe = jnp.maximum(perm, 0)
    tv = vertices[tris[safe]]                # [L, C, 3, 3]
    v0, v1, v2 = tv[:, :, 0], tv[:, :, 1], tv[:, :, 2]
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    D = jnp.sum(n * v0, axis=-1)
    valid = (perm >= 0).astype(jnp.float32)
    flat_idx = (jnp.arange(L * C, dtype=jnp.int32).reshape(L, C)
                .astype(jnp.float32))
    zeros = jnp.zeros_like(D)
    tri_rows = jnp.stack([
        v0[..., 0], v0[..., 1], v0[..., 2],
        v1[..., 0], v1[..., 1], v1[..., 2],
        v2[..., 0], v2[..., 1], v2[..., 2],
        n[..., 0], n[..., 1], n[..., 2],
        D, valid, flat_idx, zeros], axis=-1)          # [L, C, 16]

    # cluster AABBs over valid triangles
    big = jnp.where(valid[..., None, None] > 0, tv, jnp.inf)
    small = jnp.where(valid[..., None, None] > 0, tv, -jnp.inf)
    lo = big.min(axis=(1, 2))                          # [L, 3]
    hi = small.max(axis=(1, 2))
    meta_row = jnp.concatenate([lo, hi, jnp.zeros((L, 10))], axis=1)  # [L,16]
    meta = jnp.broadcast_to(meta_row[:, None, :], (L, 8, 16))
    return jnp.concatenate([meta, tri_rows], axis=1)   # [L, 8+C, 16]


def _cluster_kernel(ray_ref, tile_ref, best_t_ref, best_i_ref, *, c):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, jnp.inf)
        best_i_ref[:] = jnp.full_like(best_i_ref, -1)

    rays = ray_ref[0]                                 # [8, BR]
    o_x, o_y, o_z = rays[0:1], rays[1:2], rays[2:3]   # [1, BR]
    d_x, d_y, d_z = rays[3:4], rays[4:5], rays[5:6]
    tm = rays[6:7]

    # --- block-level AABB cull (conservative slab test)
    meta = tile_ref[0, 0:1, :]                        # [1, 16]
    prev_t = best_t_ref[0, 0:1, :]                    # [1, BR]

    def slab(lo_c, hi_c, o_c, d_c):
        inv = jnp.where(d_c != 0, 1.0 / jnp.where(d_c != 0, d_c, 1.0), 0.0)
        t1 = (lo_c - o_c) * inv
        t2 = (hi_c - o_c) * inv
        # zero-direction: conservative pass (-inf, +inf)
        t1 = jnp.where(d_c != 0, t1, -FLT_MAX)
        t2 = jnp.where(d_c != 0, t2, FLT_MAX)
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    lx, ux = slab(meta[:, 0:1], meta[:, 3:4], o_x, d_x)
    ly, uy = slab(meta[:, 1:2], meta[:, 4:5], o_y, d_y)
    lz, uz = slab(meta[:, 2:3], meta[:, 5:6], o_z, d_z)
    tnear = jnp.maximum(jnp.maximum(lx, ly), lz)
    tfar = jnp.minimum(jnp.minimum(ux, uy), uz)
    live = tm >= 0
    # a ray can still improve inside this cluster iff the slab interval is
    # non-empty, in front, and starts before its current best
    can_hit = (tnear <= tfar) & (tfar >= 0) & (tnear <= prev_t) & live
    any_hit = jnp.any(can_hit)

    @pl.when(any_hit)
    def _():
        tri = tile_ref[0, 8:, :]                      # [C, 16]

        def col(k):
            return tri[:, k:k + 1]                    # [C, 1]

        v0x, v0y, v0z = col(0), col(1), col(2)
        v1x, v1y, v1z = col(3), col(4), col(5)
        v2x, v2y, v2z = col(6), col(7), col(8)
        nx, ny, nz = col(9), col(10), col(11)
        D, valid, flat_idx = col(12), col(13), col(14)

        denom = d_x * nx + d_y * ny + d_z * nz        # [C, BR]
        t = (D - (o_x * nx + o_y * ny + o_z * nz)) / denom
        px = o_x + t * d_x
        py = o_y + t * d_y
        pz = o_z + t * d_z

        def edge_ok(ax_, ay_, az_, bx_, by_, bz_):
            ex, ey, ez = bx_ - ax_, by_ - ay_, bz_ - az_
            wx_, wy_, wz_ = px - ax_, py - ay_, pz - az_
            cx_ = ey * wz_ - ez * wy_
            cy_ = ez * wx_ - ex * wz_
            cz_ = ex * wy_ - ey * wx_
            return cx_ * nx + cy_ * ny + cz_ * nz >= 0

        inside = (edge_ok(v0x, v0y, v0z, v1x, v1y, v1z)
                  & edge_ok(v1x, v1y, v1z, v2x, v2y, v2z)
                  & edge_ok(v2x, v2y, v2z, v0x, v0y, v0z))
        ok = (t >= 0) & (t <= tm) & inside & (valid > 0)
        t = jnp.where(ok, t, jnp.inf)

        tmin = jnp.min(t, axis=0, keepdims=True)      # [1, BR]
        idx = jnp.max(jnp.where(t == tmin, flat_idx, -1.0),
                      axis=0, keepdims=True).astype(jnp.int32)

        prev_i = best_i_ref[0, 0:1, :]
        take = (tmin <= prev_t) & jnp.isfinite(tmin)
        new_t = jnp.where(take, tmin, prev_t)
        new_i = jnp.where(take, idx, prev_i)
        best_t_ref[0] = jnp.broadcast_to(new_t, best_t_ref.shape[1:])
        best_i_ref[0] = jnp.broadcast_to(new_i, best_i_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("br", "interpret"))
def pallas_cluster_tris(o, d, tmax, tiles, perm, br=DEFAULT_BR,
                        interpret=False):
    """Cluster-culled closest triangle hit.

    o, d: [R, 3]; tmax: [R]; tiles: [L, 8+C, 16] from pack_cluster_tiles;
    perm: [L, C] the cluster permutation (for id remapping).
    Returns (best_t [R], best_idx [R] — *scene* triangle ids, -1 on miss).
    """
    R = o.shape[0]
    L, rows, _ = tiles.shape
    C = rows - 8
    Rp = -(-R // br) * br

    def pad_r(x, fill=0.0):
        return jnp.pad(x, (0, Rp - R), constant_values=fill)

    rays = jnp.stack([
        pad_r(o[:, 0]), pad_r(o[:, 1]), pad_r(o[:, 2]),
        pad_r(d[:, 0]), pad_r(d[:, 1]), pad_r(d[:, 2]),
        pad_r(tmax, -1.0), jnp.zeros(Rp, jnp.float32)], axis=0)
    rays = rays.reshape(8, Rp // br, br).transpose(1, 0, 2)   # [NB, 8, BR]

    n_ray_blocks = Rp // br

    best_t, best_i = pl.pallas_call(
        functools.partial(_cluster_kernel, c=C),
        grid=(n_ray_blocks, L),
        in_specs=[
            pl.BlockSpec((1, 8, br), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8 + C, 16), lambda i, j: (j, 0, 0),
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
            flops=60 * Rp * L * C // 4,   # assume ~25% of tiles survive cull
            bytes_accessed=(Rp * 8 + L * (8 + C) * 16) * 4,
            transcendentals=0),
        interpret=interpret,
    )(rays, tiles)
    best_t = best_t[:, 0, :].reshape(-1)[:R]
    flat = best_i[:, 0, :].reshape(-1)[:R]
    scene_ids = jnp.where(flat >= 0, perm.reshape(-1)[jnp.maximum(flat, 0)],
                          -1)
    return best_t, scene_ids
