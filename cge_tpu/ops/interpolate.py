"""Barycentric interpolation helpers.

Mirrors /root/reference/src/interpolate.cpp:
  - computeBarycentricCoord (4-17): Ericson dot-product method.
  - interpolateNormal (19-23): normalize((n0*u + n1*v + n2*w) / 3) — the /3
    is a no-op under normalize but kept for bit-parity of intermediates.
  - interpolateTexCoord (25-28): linear blend.
All batched over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def barycentric_coord(v0, v1, v2, p):
    a = v1 - v0
    b = v2 - v0
    c = p - v0
    d00 = _dot(a, a)
    d01 = _dot(a, b)
    d11 = _dot(b, b)
    d20 = _dot(c, a)
    d21 = _dot(c, b)
    denom = d00 * d11 - d01 * d01
    v = (d11 * d20 - d01 * d21) / denom
    w = (d00 * d21 - d01 * d20) / denom
    u = 1.0 - v - w
    return jnp.stack([u, v, w], axis=-1)


def interpolate_normal(n0, n1, n2, bary):
    n = (n0 * bary[..., :1] + n1 * bary[..., 1:2] + n2 * bary[..., 2:3]) / 3.0
    # grad-safe at |n| = 0 (degenerate masked lanes): the norm's backward
    # is NaN there regardless of cotangent — guard inside the sqrt
    n2s = jnp.sum(n * n, axis=-1, keepdims=True)
    pos = n2s > 0
    return jnp.where(pos, n / jnp.sqrt(jnp.where(pos, n2s, 1.0)), 0.0)


def interpolate_texcoord(t0, t1, t2, bary):
    return t0 * bary[..., :1] + t1 * bary[..., 1:2] + t2 * bary[..., 2:3]
