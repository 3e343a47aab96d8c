"""Trackball camera: orbit parameterization + primary-ray generation.

Replicates the reference Trackball math exactly
(/root/reference/framework/src/trackball.cpp):
  - position() = lookAt + quat(euler) * (0, 0, -dist)          (trackball.cpp:71-74)
  - generateRay(px): camera-space dir = normalize(
        (-px.x * halfW, px.y * halfH, 1))  rotated by quat      (trackball.cpp:101-110)
    Note the **negated x** — an authoritative quirk of the reference.
  - halfH = tan(fovy/2), halfW = aspect * halfH                 (trackball.cpp:26-27)

The Euler→quaternion conversion matches glm::quat(glm::vec3) (XYZ half-angle
product form), and rotation uses the standard q ⊗ v formula so results agree
with glm bit-for-bit up to f32 rounding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def quat_from_euler(euler):
    """glm::quat(glm::vec3 eulerAngles) — XYZ half-angle products.

    euler: (..., 3) radians. Returns (w, x, y, z) as (..., 4).
    """
    e = jnp.asarray(euler, jnp.float32)
    c = jnp.cos(e * 0.5)
    s = jnp.sin(e * 0.5)
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    w = cx * cy * cz + sx * sy * sz
    x = sx * cy * cz - cx * sy * sz
    y = cx * sy * cz + sx * cy * sz
    z = cx * cy * sz - sx * sy * cz
    return jnp.stack([w, x, y, z], axis=-1)


def quat_rotate(q, v):
    """Rotate vectors v (..., 3) by quaternion q (..., 4) = (w, x, y, z)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Camera parameters (radians). Mirrors CameraConfig
    (/root/reference/src/config.h:16-21) after the degrees→radians conversion
    done at src/main.cpp:518-519.

    Registered as a pytree so it traces through jit: one compiled render
    executable serves every camera (the CLI renders N cameras without N
    recompiles — the TPU analogue of the reference's per-camera threads,
    src/main.cpp:512-531)."""

    fovy: float = float(np.radians(50.0))
    distance: float = 3.0
    look_at: tuple = (0.0, 0.0, 0.0)
    rotation: tuple = (float(np.radians(20.0)), float(np.radians(20.0)), 0.0)
    aspect: float = 1.0

    @property
    def half_screen_h(self):
        return jnp.tan(jnp.asarray(self.fovy, jnp.float32) / 2.0)

    @property
    def half_screen_w(self):
        return self.aspect * self.half_screen_h

    def position(self):
        """trackball.cpp:71-74."""
        q = quat_from_euler(jnp.asarray(self.rotation, jnp.float32))
        offset = quat_rotate(q, jnp.array([0.0, 0.0, -self.distance], jnp.float32))
        return jnp.asarray(self.look_at, jnp.float32) + offset

    def forward(self):
        q = quat_from_euler(jnp.asarray(self.rotation, jnp.float32))
        return quat_rotate(q, jnp.array([0.0, 0.0, 1.0], jnp.float32))

    def up(self):
        q = quat_from_euler(jnp.asarray(self.rotation, jnp.float32))
        return quat_rotate(q, jnp.array([0.0, 1.0, 0.0], jnp.float32))

    def left(self):
        """trackball.cpp:122-126 (positive X is camera-left in the
        right-handed GL frame)."""
        q = quat_from_euler(jnp.asarray(self.rotation, jnp.float32))
        return quat_rotate(q, jnp.array([1.0, 0.0, 0.0], jnp.float32))

    # -- interaction (the mouse handlers, trackball.cpp:136-164, as pure
    #    functions returning a new Camera; deltas in "pixels of cursor
    #    motion", positive = right/up, like GLFW reports them)

    _ROTATION_SPEED = 0.3       # trackball.cpp:13
    _TRANSLATION_SPEED = 0.005  # trackball.cpp:14
    _ZOOM_SPEED = 0.5           # trackball.cpp:15

    def orbit(self, dx: float, dy: float) -> "Camera":
        """Left-drag rotate (trackball.cpp:145-148): pitch clamped to
        +-pi/2, yaw unbounded."""
        rx, ry, rz = self.rotation
        rx = float(np.clip(rx - np.radians(dy * self._ROTATION_SPEED),
                           -np.pi / 2, np.pi / 2))
        ry = float(ry - np.radians(dx * self._ROTATION_SPEED))
        return dataclasses.replace(self, rotation=(rx, ry, rz))

    def pan(self, dx: float, dy: float) -> "Camera":
        """Right-drag translate in the image plane (trackball.cpp:150-153):
        mouse right => camera left, mouse up => camera down."""
        look = np.asarray(self.look_at, np.float32)
        look = look + dx * self._TRANSLATION_SPEED * np.asarray(self.left())
        look = look - dy * self._TRANSLATION_SPEED * np.asarray(self.up())
        return dataclasses.replace(self, look_at=tuple(float(v) for v in look))

    def zoom(self, scroll_y: float) -> "Camera":
        """Scroll dolly (trackball.cpp:159-163): distance clamped to
        [0.1, 100]."""
        d = float(np.clip(self.distance - scroll_y * self._ZOOM_SPEED,
                          0.1, 100.0))
        return dataclasses.replace(self, distance=d)

    def generate_rays(self, pixels):
        """Vectorized Trackball::generateRay (trackball.cpp:101-110).

        pixels: (..., 2) normalized coords in [-1, 1].
        Returns (origins (..., 3), directions (..., 3)); directions are unit.
        """
        px = jnp.asarray(pixels, jnp.float32)
        cam_dir = jnp.stack(
            [
                -px[..., 0] * self.half_screen_w,   # negated x quirk
                px[..., 1] * self.half_screen_h,
                jnp.ones_like(px[..., 0]),
            ],
            axis=-1,
        )
        cam_dir = cam_dir / jnp.linalg.norm(cam_dir, axis=-1, keepdims=True)
        q = quat_from_euler(jnp.asarray(self.rotation, jnp.float32))
        world_dir = quat_rotate(q, cam_dir)
        origin = jnp.broadcast_to(self.position(), world_dir.shape)
        return origin, world_dir


def pixel_grid(width: int, height: int):
    """NDC positions for every pixel — the reference samples the pixel
    *corner*, not center: ndc = (x/W)*2-1, (y/H)*2-1 (render.cpp:286-289).

    Returns (H, W, 2) float32; row index iy corresponds to screen y = iy
    (bottom at iy=0, matching the reference's GLFW convention; the image
    writer flips — screen.cpp:41-47).
    """
    xs = (np.arange(width, dtype=np.float32) / width) * 2.0 - 1.0
    ys = (np.arange(height, dtype=np.float32) / height) * 2.0 - 1.0
    gx, gy = np.meshgrid(xs, ys)  # (H, W)
    return jnp.asarray(np.stack([gx, gy], axis=-1))
