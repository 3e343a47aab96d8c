"""Texture sampling.

Mirrors acquireTexel (/root/reference/src/texture.cpp:8-48):
  - the v coordinate is flipped: row = (1 - v) * H;
  - nearest: i = min(int(max(u*W, 0)), W-1) (truncation == floor for >= 0),
    j likewise with the flipped v; pixel index row-major [j, i];
  - bilinear (extra.enableBilinearTextureFiltering): floor/ceil texel pair
    per axis clamped to [0, size-1], fractional weights via fmod(u*W, 1)
    (C-style truncated remainder — negative for negative u), 2x2 lerp.

Texels are gathered from the padded texture stack; gradients flow to texels
through the (piecewise-constant / bilinear) gather.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather(textures, tex_id, j, i):
    """textures: [K, TH, TW, 3]; tex_id/j/i: [...] int32 -> [..., 3]."""
    return textures[tex_id, j, i]


def acquire_texel_nearest(textures, tex_hw, tex_id, uv):
    h = tex_hw[tex_id, 0].astype(jnp.float32)
    w = tex_hw[tex_id, 1].astype(jnp.float32)
    u = uv[..., 0]
    v = uv[..., 1]
    i = jnp.maximum(u * w, 0.0).astype(jnp.int32)
    j = jnp.maximum((1.0 - v) * h, 0.0).astype(jnp.int32)
    i = jnp.minimum(i, w.astype(jnp.int32) - 1)
    j = jnp.minimum(j, h.astype(jnp.int32) - 1)
    return _gather(textures, tex_id, j, i)


def acquire_texel_bilinear(textures, tex_hw, tex_id, uv):
    h = tex_hw[tex_id, 0].astype(jnp.float32)
    w = tex_hw[tex_id, 1].astype(jnp.float32)
    u = uv[..., 0]
    v = uv[..., 1]
    fy = (1.0 - v) * h
    fx = u * w
    y_up = jnp.clip(jnp.ceil(fy), 0.0, h - 1).astype(jnp.int32)
    x_up = jnp.clip(jnp.ceil(fx), 0.0, w - 1).astype(jnp.int32)
    y_dn = jnp.clip(jnp.floor(fy), 0.0, h - 1).astype(jnp.int32)
    x_dn = jnp.clip(jnp.floor(fx), 0.0, w - 1).astype(jnp.int32)
    # C fmod: truncated remainder (keeps sign of the dividend)
    x_split = jnp.fmod(fx, 1.0)[..., None]
    y_split = jnp.fmod(fy, 1.0)[..., None]
    xdyd = _gather(textures, tex_id, y_dn, x_dn)
    xdyu = _gather(textures, tex_id, y_up, x_dn)
    xuyd = _gather(textures, tex_id, y_dn, x_up)
    xuyu = _gather(textures, tex_id, y_up, x_up)
    x1 = (1.0 - x_split) * xdyd + x_split * xuyd
    x2 = (1.0 - x_split) * xdyu + x_split * xuyu
    return (1.0 - y_split) * x1 + y_split * x2


def acquire_texel(textures, tex_hw, tex_id, uv, bilinear: bool):
    """Dispatch on the static bilinear flag (texture.cpp:19-47). Callers must
    guard tex_id >= 0 (the reference only calls this when a kdTexture exists,
    bounding_volume_hierarchy.cpp:413)."""
    safe_id = jnp.maximum(tex_id, 0)
    if bilinear:
        return acquire_texel_bilinear(textures, tex_hw, safe_id, uv)
    return acquire_texel_nearest(textures, tex_hw, safe_id, uv)
