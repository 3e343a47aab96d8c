"""SPMD scale-out over TPU meshes.

The reference's parallelism is an OpenMP scanline loop + one thread per
camera (render.cpp:277-280, main.cpp:512-531). The TPU-native design
(SURVEY.md §2.3):

  - 'rays' mesh axis (data-parallel analogue): the flat pixel-sample batch
    is sharded across devices; the scene is replicated; each device traces
    its slice independently — zero communication in the forward pass.
  - 'prims' mesh axis (tensor-parallel analogue): each device sweeps a
    slice of the triangle table for every ray; partial closest-hits are
    combined with an all_gather + tie-aware min-reduction over ICI
    (cge_tpu.ops.intersect.closest_hit with prims_axis set).
  - gradients: per-shard scene-parameter gradients are psum'ed over the
    mesh (the all-reduce rides ICI), overlapping with XLA's scheduling of
    the backward scan.
  - multi-host: jax.distributed.initialize + the same mesh spanning all
    processes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cge_tpu.camera import Camera, pixel_grid
from cge_tpu.diff.gradients import render_loss, scene_params, with_params
from cge_tpu.render.wavefront import trace
from cge_tpu.types import Features, RenderParams


def make_mesh(axes=("rays",), shape: Optional[tuple] = None,
              devices=None) -> Mesh:
    """Build a device mesh. Default: all devices on one 'rays' axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axes)


def _pad_to(x, mult, axis=0, value=0):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value), n


def trace_sharded(scene, o, d, features: Features, params: RenderParams,
                  mesh: Mesh, seed=0):
    """Trace a flat ray batch sharded over the mesh's 'rays' axis (and, if
    present, with the triangle sweep sharded over 'prims')."""
    n_rays_axis = mesh.shape["rays"]
    if "prims" in mesh.axis_names and mesh.shape["prims"] > 1:
        params = params.replace(prims_axis="prims",
                                prims_axis_size=mesh.shape["prims"])
        # triangle table must split evenly over the prims axis
        assert scene.tris.shape[0] % mesh.shape["prims"] == 0

    o_p, n = _pad_to(o, n_rays_axis)
    d_p, _ = _pad_to(d, n_rays_axis)
    key = jax.random.PRNGKey(seed)

    spec_rays = P("rays")
    spec_rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_rep, spec_rays, spec_rays, spec_rep),
        out_specs=spec_rays,
        check_vma=False)
    def run(scene_rep, o_l, d_l, key_l):
        # stochastic streams are keyed by GLOBAL ray id (r5), so the
        # sharded trace draws exactly the single-device samples — sharded
        # renders are bit-identical to unsharded for EVERY feature set,
        # not just the deterministic ones
        nl = o_l.shape[0]
        ids = (jax.lax.axis_index("rays") * nl
               + jnp.arange(nl, dtype=jnp.int32))
        return trace(scene_rep, o_l, d_l, features, params, key_l,
                     ray_ids=ids)

    col = run(scene, o_p, d_p, key)
    return col[:n]


def render_image_sharded(scene, camera: Camera, features: Features,
                         params: RenderParams, width: int, height: int,
                         mesh: Mesh, seed=0):
    """Sharded single-sample render (the MSAA/DoF paths shard identically
    through trace_sharded; see cge_tpu.render.renderer for their weighting)."""
    grid = pixel_grid(width, height).reshape(-1, 2)
    o, d = camera.generate_rays(grid)
    col = trace_sharded(scene, o, d, features, params, mesh, seed)
    return jnp.flipud(col.reshape(height, width, 3))


def train_step_sharded(scene, o, d, target, features: Features,
                       params: RenderParams, mesh: Mesh, lr=1e-3, seed=0):
    """One differentiable-render SGD step, fully sharded:

    rays (+ target pixels) sharded over 'rays'; scene replicated; triangle
    sweep optionally sharded over 'prims'; scene-parameter gradients
    psum'ed over every mesh axis (ICI all-reduce). Returns (loss, new_scene).
    """
    if "prims" in mesh.axis_names and mesh.shape["prims"] > 1:
        params = params.replace(prims_axis="prims",
                                prims_axis_size=mesh.shape["prims"])
        assert scene.tris.shape[0] % mesh.shape["prims"] == 0
    n_rays_axis = mesh.shape["rays"]
    o_p, _ = _pad_to(o, n_rays_axis)
    d_p, _ = _pad_to(d, n_rays_axis)
    t_p, _ = _pad_to(target, n_rays_axis)
    key = jax.random.PRNGKey(seed)
    p0 = scene_params(scene)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P("rays"), P("rays"), P("rays"), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def step(p, scene_rep, o_l, d_l, target_l, key_l):
        # global ray ids key the stochastic streams (r5): every shard draws
        # the samples the single-device trace would, so sharded loss/grads
        # equal single-device for every feature set
        nl = o_l.shape[0]
        ids = (jax.lax.axis_index("rays") * nl
               + jnp.arange(nl, dtype=jnp.int32))
        loss, grads = jax.value_and_grad(render_loss)(
            p, scene_rep, o_l, d_l, target_l, features, params, key_l, ids)
        # all-reduce over the whole mesh: mean over ray shards, and psum
        # over prims (each prims-shard computed identical full-batch grads
        # from its partial sweep + all_gather, so mean there too)
        axes = tuple(mesh.axis_names)
        loss = jax.lax.pmean(loss, axes)
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, axes), grads)
        return loss, grads

    loss, grads = step(p0, scene, o_p, d_p, t_p, key)
    new_params = jax.tree.map(lambda v, g: v - lr * g, p0, grads)
    return loss, with_params(scene, new_params)


def init_distributed(**kw):
    """Multi-host entry: call once per process before creating the mesh
    (jax.distributed handles the DCN rendezvous; collectives ride ICI
    within a slice)."""
    jax.distributed.initialize(**kw)
