"""Screen-space z-buffer rasterizer.

The TPU-native stand-in for the fixed-function GL raster stage the
reference's preview uses (GL_FILL front+back, GL_DEPTH_TEST, GL_SMOOTH —
/root/reference/src/main.cpp:560-568): two-sided edge-function coverage at
pixel centers, window-space barycentric depth, GL_LESS depth test with the
first-drawn triangle winning exact-z ties, Gouraud color interpolation.

Everything is masked dense math over [pixel_chunk, tri_tile] blocks — the
same divergence-free shape discipline as the ray sweeps — so it runs on the
VPU and vmaps/shards cleanly. Near-plane behavior: triangles with any
vertex at w_clip <= 0 are dropped rather than re-tessellated (documented
preview simplification vs GL clipping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cross2(ax, ay, bx, by):
    return ax * by - ay * bx


def _tri_cover_depth(px, py, xy, z, w, tris):
    """Coverage + depth of every triangle at every pixel.

    px, py: [P] pixel-center window coords; xy: [V, 2]; z: [V] ndc depth;
    w: [V] clip w; tris: [T, 3]. Returns (cover [P, T], depth [P, T]).
    """
    a = xy[tris[:, 0]]                                  # [T, 2]
    b = xy[tris[:, 1]]
    c = xy[tris[:, 2]]
    za, zb, zc = z[tris[:, 0]], z[tris[:, 1]], z[tris[:, 2]]
    ok_w = (w[tris[:, 0]] > 0) & (w[tris[:, 1]] > 0) & (w[tris[:, 2]] > 0)

    area2 = _cross2(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1],
                    c[:, 0] - a[:, 0], c[:, 1] - a[:, 1])      # [T]
    pax = px[:, None] - a[None, :, 0]                   # [P, T]
    pay = py[:, None] - a[None, :, 1]
    pbx = px[:, None] - b[None, :, 0]
    pby = py[:, None] - b[None, :, 1]
    # sub-triangle areas (signed, same orientation as area2)
    w_c = _cross2(b[None, :, 0] - a[None, :, 0],
                  b[None, :, 1] - a[None, :, 1], pax, pay)     # [P, T]
    w_a = _cross2(c[None, :, 0] - b[None, :, 0],
                  c[None, :, 1] - b[None, :, 1], pbx, pby)
    w_b = area2[None, :] - w_a - w_c
    s = jnp.sign(area2)[None, :]
    cover = ((w_a * s >= 0) & (w_b * s >= 0) & (w_c * s >= 0)
             & (area2 != 0)[None, :] & ok_w[None, :])
    inv = jnp.where(area2 != 0, 1.0 / jnp.where(area2 != 0, area2, 1.0), 0.0)
    l_a = w_a * inv[None, :]
    l_b = w_b * inv[None, :]
    l_c = w_c * inv[None, :]
    depth = l_a * za[None, :] + l_b * zb[None, :] + l_c * zc[None, :]
    cover = cover & (depth >= -1.0) & (depth <= 1.0)    # clip z range
    return cover, depth


@functools.partial(jax.jit, static_argnames=("width", "height",
                                             "pixel_chunk", "tri_tile"))
def rasterize(xy, z, w, tris, width: int, height: int,
              pixel_chunk: int = 16384, tri_tile: int = 512):
    """Full-image visibility: returns (tri_id [H, W] i32 (-1 = background),
    depth [H, W] f32 (ndc, +1 where empty)). Row 0 = window bottom (GL
    convention; callers flip for images like Screen::setPixel does)."""
    T = tris.shape[0]
    n_tiles = -(-T // tri_tile)
    padT = n_tiles * tri_tile - T
    tris_p = jnp.pad(tris, ((0, padT), (0, 0)))
    valid = jnp.pad(jnp.ones(T, bool), (0, padT))

    P = width * height
    iy, ix = jnp.divmod(jnp.arange(P, dtype=jnp.int32), width)
    px_all = ix.astype(jnp.float32) + 0.5
    py_all = iy.astype(jnp.float32) + 0.5

    n_chunks = -(-P // pixel_chunk)
    padP = n_chunks * pixel_chunk - P
    px_all = jnp.pad(px_all, (0, padP), constant_values=-10.0)
    py_all = jnp.pad(py_all, (0, padP), constant_values=-10.0)

    def chunk(args):
        px, py = args

        def tile(carry, k):
            best_z, best_i = carry
            tt = jax.lax.dynamic_slice_in_dim(tris_p, k * tri_tile,
                                              tri_tile, 0)
            tv = jax.lax.dynamic_slice_in_dim(valid, k * tri_tile,
                                              tri_tile, 0)
            cover, depth = _tri_cover_depth(px, py, xy, z, w, tt)
            cover = cover & tv[None, :]
            depth = jnp.where(cover, depth, jnp.inf)
            zmin = jnp.min(depth, axis=1)               # [P]
            ids = jax.lax.broadcasted_iota(jnp.int32, depth.shape, 1) \
                + k * tri_tile
            # GL_LESS + sequential draw: the FIRST triangle at the minimal
            # depth wins ties -> smallest index among the tile's minima, and
            # an earlier tile is only displaced by a strictly closer z
            idx = jnp.min(jnp.where(depth == zmin[:, None], ids, T + 1),
                          axis=1)
            take = zmin < best_z
            return (jnp.where(take, zmin, best_z),
                    jnp.where(take, idx, best_i)), None

        init = (jnp.full(px.shape[0], jnp.inf, jnp.float32),
                jnp.full(px.shape[0], -1, jnp.int32))
        (bz, bi), _ = jax.lax.scan(tile, init, jnp.arange(n_tiles))
        return bz, bi

    bz, bi = jax.lax.map(chunk, (px_all.reshape(n_chunks, pixel_chunk),
                                 py_all.reshape(n_chunks, pixel_chunk)))
    bz = bz.reshape(-1)[:P]
    bi = bi.reshape(-1)[:P]
    bz = jnp.where(jnp.isfinite(bz), bz, 1.0)
    return bi.reshape(height, width), bz.reshape(height, width)


@functools.partial(jax.jit, static_argnames=())
def shade_gouraud(tri_id, xy, z, tris, vert_colors, background=None):
    """Deferred Gouraud shade: window-space barycentric blend of the
    winning triangle's vertex colors (GL_SMOOTH, main.cpp:568).

    tri_id: [H, W]; returns [H, W, 3] with glClearColor black background
    (main.cpp:373)."""
    H, W = tri_id.shape
    flat = tri_id.reshape(-1)
    safe = jnp.maximum(flat, 0)
    t = tris[safe]                                      # [P, 3]
    a, b, c = xy[t[:, 0]], xy[t[:, 1]], xy[t[:, 2]]
    ca, cb, cc = vert_colors[t[:, 0]], vert_colors[t[:, 1]], \
        vert_colors[t[:, 2]]
    iy, ix = jnp.divmod(jnp.arange(H * W, dtype=jnp.int32), W)
    px = ix.astype(jnp.float32) + 0.5
    py = iy.astype(jnp.float32) + 0.5
    area2 = _cross2(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1],
                    c[:, 0] - a[:, 0], c[:, 1] - a[:, 1])
    w_c = _cross2(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1],
                  px - a[:, 0], py - a[:, 1])
    w_a = _cross2(c[:, 0] - b[:, 0], c[:, 1] - b[:, 1],
                  px - b[:, 0], py - b[:, 1])
    w_b = area2 - w_a - w_c
    inv = jnp.where(area2 != 0, 1.0 / jnp.where(area2 != 0, area2, 1.0), 0.0)
    col = (w_a * inv)[:, None] * ca + (w_b * inv)[:, None] * cb \
        + (w_c * inv)[:, None] * cc
    if background is None:
        bg = jnp.zeros(3, jnp.float32)
    else:
        bg = jnp.asarray(background, jnp.float32)
    col = jnp.where((flat >= 0)[:, None], col, bg)
    return jnp.clip(col.reshape(H, W, 3), 0.0, 1.0)
