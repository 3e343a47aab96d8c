"""Pallas TPU kernel: fused ray x triangle closest-hit sweep.

This replaces the XLA scan/map pipeline in cge_tpu.ops.intersect for the hot
path. One grid program handles a tile of BT triangles (sublane axis) against
a block of BR rays (lane axis); the triangle-tile grid dimension is
innermost so the output block (best_t, best_idx per ray) stays resident in
VMEM and is updated sequentially — the Pallas analogue of the reference's
`getIntersecting` loop (bounding_volume_hierarchy.cpp:272-293), preserving
its acceptance + tie rules exactly:

  - accept iff 0 <= t <= ray.t with the plane-then-point-in-triangle test
    (prebuilt kernel semantics, see cge_tpu.ops.intersect);
  - sequential last-wins: within a tile the largest triangle index among
    t == tmin wins; across tiles a later tile replaces on t <= best.

Data layout (TPU tiling: sublane x lane = 8 x 128 f32):
  - rays packed as [n_blocks, 8, BR]: sublanes = (ox,oy,oz,dx,dy,dz,tmax,pad)
  - triangles packed as [T, 16]: lanes = (v0,v1,v2,n per component, D, valid)
    read per tile as [BT, 16] and sliced into [BT, 1] columns
  - the inner loop is pure VPU elementwise math (~60 flops per pair),
    no gathers, no transposes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BR = 512   # rays per block (lane axis)
DEFAULT_BT = 256   # triangles per tile (sublane axis)

_TRI_FIELDS = ("v0x", "v0y", "v0z", "v1x", "v1y", "v1z",
               "v2x", "v2y", "v2z", "nx", "ny", "nz", "D", "valid")


def prepare_tri_soa(scene):
    """Packed [T, 16] triangle table for the whole scene."""
    return pack_tri_table(scene.vertices, scene.tris, scene.tri_mask)


def pack_tri_table(vertices, tris, mask):
    """Precompute the packed [T, 16] triangle table: vertices, plane
    normal + D (trianglePlane semantics), valid flag, 2 pad lanes."""
    v = vertices
    t = tris
    v0 = v[t[:, 0]]
    v1 = v[t[:, 1]]
    v2 = v[t[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    D = jnp.sum(n * v0, axis=-1)
    cols = [v0[:, 0], v0[:, 1], v0[:, 2],
            v1[:, 0], v1[:, 1], v1[:, 2],
            v2[:, 0], v2[:, 1], v2[:, 2],
            n[:, 0], n[:, 1], n[:, 2],
            D, mask.astype(jnp.float32),
            jnp.zeros_like(D), jnp.zeros_like(D)]
    return jnp.stack(cols, axis=1)  # [T, 16]


def _sweep_kernel(ray_ref, tri_ref, best_t_ref, best_i_ref, *, bt):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, jnp.inf)
        best_i_ref[:] = jnp.full_like(best_i_ref, -1)

    rays = ray_ref[0]                                 # [8, BR]
    o_x, o_y, o_z = rays[0:1], rays[1:2], rays[2:3]   # [1, BR]
    d_x, d_y, d_z = rays[3:4], rays[4:5], rays[5:6]
    tm = rays[6:7]

    tri = tri_ref[:]                                  # [BT, 16]

    def col(k):
        return tri[:, k:k + 1]                        # [BT, 1]

    v0x, v0y, v0z = col(0), col(1), col(2)
    v1x, v1y, v1z = col(3), col(4), col(5)
    v2x, v2y, v2z = col(6), col(7), col(8)
    nx, ny, nz = col(9), col(10), col(11)
    D, valid = col(12), col(13)

    denom = d_x * nx + d_y * ny + d_z * nz            # [BT, BR]
    t = (D - (o_x * nx + o_y * ny + o_z * nz)) / denom
    px = o_x + t * d_x
    py = o_y + t * d_y
    pz = o_z + t * d_z

    def edge_ok(ax_, ay_, az_, bx_, by_, bz_):
        # dot(cross(b - a, p - a), n) >= 0 for edge (a -> b)
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

    tmin = jnp.min(t, axis=0, keepdims=True)          # [1, BR]
    ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0) + j * bt
    idx = jnp.max(jnp.where(t == tmin, ids, -1), axis=0, keepdims=True)

    prev_t = best_t_ref[0, 0:1, :]
    prev_i = best_i_ref[0, 0:1, :]
    take = (tmin <= prev_t) & jnp.isfinite(tmin)
    new_t = jnp.where(take, tmin, prev_t)
    new_i = jnp.where(take, idx, prev_i)
    best_t_ref[0] = jnp.broadcast_to(new_t, best_t_ref.shape[1:])
    best_i_ref[0] = jnp.broadcast_to(new_i, best_i_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("br", "bt", "interpret"))
def pallas_closest_tris(o, d, tmax, tri_soa, br=DEFAULT_BR, bt=DEFAULT_BT,
                        interpret=False):
    """Closest triangle hit for R rays against T triangles.

    o, d: [R, 3]; tmax: [R]; tri_soa: [T, 16] from prepare_tri_soa.
    Returns (best_t [R] f32 — +inf on miss, best_idx [R] i32 — -1 on miss).
    Rays with tmax < 0 are dead. R and T are padded internally.
    """
    R = o.shape[0]
    T = tri_soa.shape[0]
    Rp = -(-R // br) * br
    Tp = -(-T // bt) * bt

    def pad_r(x, fill=0.0):
        return jnp.pad(x, (0, Rp - R), constant_values=fill)

    rays = jnp.stack([
        pad_r(o[:, 0]), pad_r(o[:, 1]), pad_r(o[:, 2]),
        pad_r(d[:, 0]), pad_r(d[:, 1]), pad_r(d[:, 2]),
        pad_r(tmax, -1.0), jnp.zeros(Rp, jnp.float32)], axis=0)  # [8, Rp]
    rays = rays.reshape(8, Rp // br, br).transpose(1, 0, 2)      # [NB, 8, BR]
    tris = jnp.pad(tri_soa, ((0, Tp - T), (0, 0)))               # [Tp, 16]

    n_ray_blocks = Rp // br
    n_tri_tiles = Tp // bt

    best_t, best_i = pl.pallas_call(
        functools.partial(_sweep_kernel, bt=bt),
        grid=(n_ray_blocks, n_tri_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, br), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 16), lambda i, j: (j, 0),
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
            flops=60 * Rp * Tp, bytes_accessed=(Rp * 8 + Tp * 16) * 4,
            transcendentals=0),
        interpret=interpret,
    )(rays, tris)
    return (best_t[:, 0, :].reshape(-1)[:R],
            best_i[:, 0, :].reshape(-1)[:R])
