"""GL-convention camera matrices.

Replicates the matrices the reference feeds to the fixed-function pipeline
(/root/reference/src/main.cpp:540-554):
  - view = glm::lookAt(camera.position(), camera.lookAt(), camera.up())
    (framework/src/trackball.cpp:81-84)
  - projection = glm::perspective(fovy, aspect, 0.01, 100)
    (framework/src/trackball.cpp:86-89)
glm defaults: right-handed eye space, clip z in [-1, 1].
"""

from __future__ import annotations

import jax.numpy as jnp

NEAR = 0.01   # trackball.cpp:88
FAR = 100.0


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def look_at(eye, center, up):
    """glm::lookAtRH. Returns [4, 4] f32 (row-major, y = M @ [p, 1])."""
    eye = jnp.asarray(eye, jnp.float32)
    f = _normalize(jnp.asarray(center, jnp.float32) - eye)
    s = _normalize(jnp.cross(f, jnp.asarray(up, jnp.float32)))
    u = jnp.cross(s, f)
    return jnp.stack([
        jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
        jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
        jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
    ])


def perspective(fovy, aspect, near=NEAR, far=FAR):
    """glm::perspectiveRH_NO (clip z in [-1, 1]). Returns [4, 4] f32."""
    t = jnp.tan(jnp.asarray(fovy, jnp.float32) / 2.0)
    z = jnp.float32(0.0)
    return jnp.stack([
        jnp.stack([1.0 / (aspect * t), z, z, z]),
        jnp.stack([z, 1.0 / t, z, z]),
        jnp.stack([z, z, -(far + near) / (far - near),
                   -(2.0 * far * near) / (far - near)]),
        jnp.stack([z, z, -jnp.float32(1.0), z]),
    ])


def camera_matrices(camera, width: int, height: int):
    """(view, proj) for a cge_tpu Camera, with the window aspect
    (main.cpp:542-553; aspect from the GLFW window, window.cpp)."""
    view = look_at(camera.position(), jnp.asarray(camera.look_at, jnp.float32),
                   camera.up())
    proj = perspective(camera.fovy, width / height)
    return view, proj


def project_vertices(vertices, view, proj, width: int, height: int):
    """World -> window coordinates (GL viewport transform).

    Returns (xy [V, 2] window coords with y up, z_ndc [V], w_clip [V]).
    w_clip <= 0 marks vertices at/behind the eye plane (would be clipped by
    GL; the rasterizer drops triangles touching them — no near-plane
    re-tessellation, a documented preview simplification).
    """
    v = jnp.asarray(vertices, jnp.float32)
    vh = jnp.concatenate([v, jnp.ones_like(v[:, :1])], axis=1)   # [V, 4]
    clip = vh @ (proj @ view).T                                   # [V, 4]
    w = clip[:, 3]
    safe_w = jnp.where(w != 0, w, 1.0)
    ndc = clip[:, :3] / safe_w[:, None]
    x = (ndc[:, 0] + 1.0) * 0.5 * width
    y = (ndc[:, 1] + 1.0) * 0.5 * height
    return jnp.stack([x, y], axis=1), ndc[:, 2], w
