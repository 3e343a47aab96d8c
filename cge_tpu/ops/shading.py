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
    """Grad-safe normalize: zero vectors map to zero instead of NaN.

    Zero directions reach here only as masked-out lanes (the TRANS+REC
    tree concatenates zero-sentinel mirror children, render.cpp:42-47
    semantics), but jnp.linalg.norm's OWN backward at |v| = 0 is
    v/|v| = NaN regardless of the cotangent — so the guard must sit
    INSIDE the sqrt (found by the r5 sharded transrec grad test). The
    |v| > 0 result is bit-identical (norm == sqrt(sum(v*v)))."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    pos = n2 > 0
    n = jnp.sqrt(jnp.where(pos, n2, 1.0))
    return jnp.where(pos, v / n, 0.0)


def cpp_pow(base, exp):
    """IEC 60559 pow(): negative base allowed for integral exponents
    (result sign = parity of exponent), NaN for non-integral exponents.
    jnp.power would return NaN for all negative bases.

    Grad-safe ("double where"): the inner power only ever sees a strictly
    positive base so reverse-mode never produces 0 * inf / log(<=0) NaNs."""
    val, nan_mask = cpp_pow_masked(base, exp)
    return jnp.where(nan_mask, jnp.nan, val)


def cpp_pow_masked(base, exp):
    """Like cpp_pow but returns (finite_value, nan_mask) so callers can keep
    products NaN-free (a forward NaN times a zero cotangent poisons grads)
    and inject the parity NaN via a select at the very end."""
    ip = jnp.round(exp)
    is_int = exp == ip
    odd = jnp.abs(jnp.mod(ip, 2.0)) == 1.0
    absb = jnp.abs(base)
    nonzero = absb > 0
    mag = jnp.power(jnp.where(nonzero, absb, 1.0), exp)
    # pow(0, exp): 1 for exp == 0, 0 for exp > 0, inf for exp < 0
    zero_val = jnp.where(exp == 0, 1.0, jnp.where(exp > 0, 0.0, jnp.inf))
    mag = jnp.where(nonzero, mag, zero_val)
    neg = base < 0
    val = jnp.where(neg & odd & is_int, -mag, mag)
    nan_mask = neg & ~is_int
    return val, nan_mask


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
    spec_raw, spec_nan = cpp_pow_masked(_dot(camera, reflection), shininess)
    spec_d = jnp.where(gate, spec_raw, 0.0)
    specular = ks * light_color * spec_d[..., None]
    out = diffuse + specular
    # parity NaN (std::pow(negative, non-integral)) injected via select so
    # the finite compute graph keeps clean gradients
    return jnp.where((gate & spec_nan)[..., None], jnp.nan, out)


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
