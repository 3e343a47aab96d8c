"""Fixed-function GL vertex lighting for the rasterization preview.

Replicates what drawSceneOpenGL configures (/root/reference/src/main.cpp:
608-658) with setMaterial (/root/reference/src/draw.cpp:27-36):

  - every scene light becomes legacy point lights: a PointLight directly; a
    SegmentLight as two endpoint lights at half color; a ParallelogramLight
    as four corner lights at quarter color (main.cpp:636-652);
  - GL_AMBIENT and GL_SPECULAR are zero for both lights and material, so
    the GL lighting equation reduces to the diffuse term
      sum_l  kd * clamp(light_color, 0, 1) * max(dot(n_hat, l_hat), 0)
    with constant attenuation 1 (main.cpp:625-631, draw.cpp:29-36);
  - GL_NORMALIZE is on (main.cpp:562) — normals renormalized here;
  - vertex colors are clamped to [0, 1] (GL clamps post-lighting), then
    Gouraud-interpolated by the rasterizer (GL_SMOOTH, main.cpp:568).
"""

from __future__ import annotations

import jax.numpy as jnp


def gl_point_lights(scene):
    """Expand scene lights into the legacy point-light set.

    Returns (positions [K, 3], colors [K, 3], mask [K]) with K static
    (3 * max_point + 2 * max_segment + 4 * max_parallelogram slots).
    """
    pos = [scene.point_pos]
    col = [scene.point_color]
    msk = [scene.point_mask]

    pos += [scene.seg_p0, scene.seg_p1]
    col += [0.5 * scene.seg_c0, 0.5 * scene.seg_c1]
    msk += [scene.seg_mask, scene.seg_mask]

    v0, e01, e02 = scene.par_v0, scene.par_e01, scene.par_e02
    pos += [v0, v0 + e01, v0 + e02, v0 + e01 + e02]
    col += [0.25 * scene.par_c0, 0.25 * scene.par_c1,
            0.25 * scene.par_c2, 0.25 * scene.par_c3]
    msk += [scene.par_mask] * 4

    return (jnp.concatenate(pos), jnp.concatenate(col),
            jnp.concatenate(msk))


def vertex_materials(scene):
    """Per-vertex kd via the owning triangle's material (meshes are split
    per material and vertices deduped per mesh — framework/src/mesh.cpp:
    79-119 — so each vertex has a unique material)."""
    V = scene.vertices.shape[0]
    # scatter into a V+1 buffer: masked-out padding triangles write to the
    # sentinel row V instead of clobbering vertex 0's material
    vert_mat = jnp.zeros(V + 1, jnp.int32)
    valid = scene.tri_mask
    tm = jnp.where(valid, scene.tri_mat, 0)
    for k in range(3):
        idx = jnp.where(valid, scene.tris[:, k], V)
        vert_mat = vert_mat.at[idx].set(tm)
    return scene.mat_kd[vert_mat[:V]]


def gl_vertex_colors(scene):
    """Per-vertex GL-lit colors [V, 3] (diffuse-only, see module doc)."""
    n = scene.normals
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    kd = vertex_materials(scene)                       # [V, 3]
    lpos, lcol, lmask = gl_point_lights(scene)
    lcol = jnp.clip(lcol, 0.0, 1.0)
    ldir = lpos[None, :, :] - scene.vertices[:, None, :]    # [V, K, 3]
    ldir = ldir / jnp.maximum(
        jnp.linalg.norm(ldir, axis=-1, keepdims=True), 1e-20)
    ndotl = jnp.maximum(jnp.sum(n[:, None, :] * ldir, axis=-1), 0.0)
    contrib = ndotl[..., None] * lcol[None, :, :]           # [V, K, 3]
    contrib = jnp.where(lmask[None, :, None], contrib, 0.0)
    return jnp.clip(kd * contrib.sum(axis=1), 0.0, 1.0)
