"""Phong shading + reflection rays.

Mirrors /root/reference/src/shading.cpp with its authoritative quirks:
  - the "camera" vector in the specular term is the *incoming* normalized ray
    direction, not the view vector (shading.cpp:25);
  - specular only fires when dot(n, l) > 0 AND dot(n, ray.dir) > 0
    (shading.cpp:29) — i.e. essentially only on back-facing normals;
  - std::pow with a negative base: defined for integral exponents (sign from
    parity), NaN otherwise — ``cpp_pow`` replicates IEC 60559 pow semantics
    so renders agree bit-for-bit with the C++ even in the NaN cases;
  - computeReflectionRay returns a zero sentinel when ks == (0,0,0)
    (shading.cpp:42-47), else r = normalize(2 dot(n, -d̂) n + d̂) with origin
    offset +1e-5 n (shading.cpp:51-58).
"""

from __future__ import annotations

import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def cpp_pow(base, exp):
    """IEC 60559 pow(): negative base allowed for integral exponents
    (result sign = parity of exponent), NaN for non-integral exponents.
    jnp.power would return NaN for all negative bases."""
    ip = jnp.round(exp)
    is_int = exp == ip
    odd = jnp.abs(jnp.mod(ip, 2.0)) == 1.0
    mag = jnp.power(jnp.abs(base), exp)
    neg_val = jnp.where(is_int, jnp.where(odd, -mag, mag), jnp.nan)
    return jnp.where(base < 0, neg_val, jnp.power(base, exp))


def compute_shading(light_pos, light_color, ray_o, ray_d, ray_t,
                    normal, kd, ks, shininess):
    """computeShading (shading.cpp:7-37), batched over leading dims.

    Assumes enable_shading (the disabled path short-circuits one level up,
    light.cpp:161-164). ray_d need not be normalized (the hit point uses
    t in units of |d|, matching `ray.direction * ray.t + ray.origin`).
    """
    n = _normalize(normal)
    p = ray_d * ray_t[..., None] + ray_o
    light = _normalize(light_pos - p)
    ndl = _dot(n, light)
    diffuse = kd * light_color * jnp.maximum(ndl, 0.0)[..., None]

    camera = _normalize(ray_d)
    gate = (ndl > 0) & (_dot(n, camera) > 0)
    reflection = 2.0 * ndl[..., None] * n - light
    spec_d = cpp_pow(_dot(camera, reflection), shininess)
    spec_d = jnp.where(gate, spec_d, 0.0)
    specular = ks * light_color * spec_d[..., None]
    return diffuse + specular


def compute_reflection_ray(ray_o, ray_d, ray_t, normal, ks):
    """computeReflectionRay (shading.cpp:40-62), batched.

    Returns (origin, direction, valid). When ks == 0 the reference returns a
    zero-sentinel ray (direction (0,0,0), t=0) which downstream code treats
    as 'no reflection'; we return valid=False and a zero direction so a
    blind trace of it misses everything (as in the reference).
    """
    valid = jnp.any(ks != 0.0, axis=-1)
    p = ray_t[..., None] * ray_d + ray_o
    n = _normalize(normal)
    r = _normalize(-ray_d)
    refl = _normalize(2.0 * _dot(n, r)[..., None] * n - r)
    origin = p + 1e-5 * n
    zeros = jnp.zeros_like(refl)
    return (jnp.where(valid[..., None], origin, zeros),
            jnp.where(valid[..., None], refl, zeros),
            valid)
