"""Differentiable rendering: parameter partition, loss, and train step.

The reference is a forward-only C++ renderer; differentiability is a new
capability of the TPU build (BASELINE.md north star): pixel gradients flow
to vertex positions, materials (kd/ks/shininess/transparency), texels,
sphere geometry, and light parameters.

Design: the discrete hit selection carries stop_gradient
(cge_tpu.render.wavefront.hit_attributes); every continuous quantity (t,
barycentrics, normals, shading, blends, texture lerp) is recomputed from
scene parameters, so reverse-mode AD through the bounce scan yields correct
gradients for the piecewise-smooth regions (visibility discontinuities are
not differentiated — the standard limitation, documented).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cge_tpu.render.wavefront import trace

# SceneArrays leaves that participate in differentiation.
DIFF_FIELDS = (
    "vertices", "normals", "uvs",
    "mat_kd", "mat_ks", "mat_shininess", "mat_transparency",
    "textures",
    "sph_center", "sph_radius",
    "point_pos", "point_color",
    "seg_p0", "seg_p1", "seg_c0", "seg_c1",
    "par_v0", "par_e01", "par_e02",
    "par_c0", "par_c1", "par_c2", "par_c3",
)


def scene_params(scene) -> dict:
    """Extract the differentiable float leaves as a flat dict."""
    return {f: getattr(scene, f) for f in DIFF_FIELDS}


def with_params(scene, params: dict):
    """Rebuild a SceneArrays with the given differentiable leaves."""
    return dataclasses.replace(scene, **params)


def render_loss(params, scene, rays_o, rays_d, target, features,
                render_params, key, ray_ids=None):
    """Mean-squared error of traced radiance vs target, over a ray batch.

    NaN radiance (the reference's pow-quirk pixels, cge_tpu.ops.shading)
    is mapped to 0 — the same value the image writer emits for them — so
    the loss stays finite and those pixels contribute zero gradient.
    ray_ids: global ids keying the stochastic streams (sharded callers pass
    their shard's global slice so samples match the unsharded trace)."""
    s = with_params(scene, params)
    col = trace(s, rays_o, rays_d, features, render_params, key,
                ray_ids=ray_ids)
    col = jnp.nan_to_num(col)
    return jnp.mean((col - target) ** 2)


def loss_and_grads(scene, rays_o, rays_d, target, features, render_params,
                   key):
    """Value + gradients w.r.t. every differentiable scene leaf."""
    p = scene_params(scene)
    return jax.value_and_grad(render_loss)(
        p, scene, rays_o, rays_d, target, features, render_params, key)


def sgd_step(scene, grads: dict, lr: float):
    """Plain SGD on the differentiable leaves (optimizers beyond this should
    come from optax on top of scene_params/with_params)."""
    p = scene_params(scene)
    new = {k: v - lr * grads[k] for k, v in p.items()}
    return with_params(scene, new)
