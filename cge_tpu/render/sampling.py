"""Pixel sampling: MSAA jitter grids and depth-of-field ray generation.

Mirrors /root/reference/src/render.cpp:
  - getRaySamples (211-227): n x n sub-pixel grid with uniform jitter inside
    each sub-pixel box; fresh jitter per sample.
  - getPlane (229-234): D = dist - |camera.position| (an authoritative
    quirk: uses the norm of the position *vector*), normal =
    normalize(lookAt - position).
  - getDOFRays (243-271): disk-sampled origins with r = sqrt(U[0, radius])
    (uniform over radius, then sqrt — another quirk), focal point from the
    center ray x focal plane; directions left unnormalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cge_tpu.camera import Camera


def msaa_sample_positions(pixel_pos, pixel_size, n: int, key):
    """pixel_pos: [N, 2] NDC corners; returns [N, n*n, 2] jittered positions."""
    box = pixel_size / n                                     # (2,)
    ij = jnp.stack(jnp.meshgrid(jnp.arange(n, dtype=jnp.float32),
                                jnp.arange(n, dtype=jnp.float32),
                                indexing="ij"), axis=-1).reshape(-1, 2)  # [n*n,2]
    base = pixel_pos[:, None, :] + ij[None, :, :] * box[None, None, :]
    jit = jax.random.uniform(key, base.shape) * box[None, None, :]
    return base + jit


def dof_rays(pixel_pos, camera: Camera, focal_length: float,
             sampling_radius: float, n: int, key):
    """pixel_pos: [N, 2]; returns (origins [N, n, 3], dirs [N, n, 3])."""
    cam_pos = camera.position()
    N_vec = cam_pos * 0 + (jnp.asarray(camera.look_at, jnp.float32) - cam_pos)
    N_vec = N_vec / jnp.linalg.norm(N_vec)
    # getPlane quirk: D = dist - |position|
    D_focal = focal_length - jnp.sqrt(jnp.dot(cam_pos, cam_pos))

    o, d = camera.generate_rays(pixel_pos)                   # [N,3] each
    hi = jax.lax.Precision.HIGHEST  # keep the mat-vec off the bf16 MXU path
    t = ((D_focal - jnp.matmul(o, N_vec, precision=hi))
         / jnp.matmul(d, N_vec, precision=hi))
    focal_point = o + t[:, None] * d                         # [N,3]

    v1 = jnp.where((N_vec[0] == 0) & (N_vec[1] == 0),
                   jnp.array([N_vec[2], 0.0, -N_vec[0]]),
                   jnp.array([-N_vec[1], N_vec[0], 0.0]))
    v1 = v1 / jnp.linalg.norm(v1)
    v2 = jnp.cross(N_vec, v1)
    v2 = v2 / jnp.linalg.norm(v2)

    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, (pixel_pos.shape[0], n)) * sampling_radius)
    theta = jax.random.uniform(k2, (pixel_pos.shape[0], n)) * (2 * jnp.pi)
    offset = (r * jnp.cos(theta))[..., None] * v1 + (r * jnp.sin(theta))[..., None] * v2
    origins = o[:, None, :] + offset
    dirs = focal_point[:, None, :] - origins                 # unnormalized
    return origins, dirs
