"""Debug-visualization exports — the reference's OpenGL visual debuggers
re-expressed as arrays and images.

The reference verifies features with immediate-mode GL overlays
(/root/reference/src/draw.cpp, wired in main.cpp:379-463): colored debug
rays (render.cpp:135-147), shadow-ray red/color coding (light.cpp:63-71),
per-vertex + interpolated normal rays (bounding_volume_hierarchy.cpp:388-392)
and BVH level/leaf/SAH overlays (main.cpp:438-463). A headless TPU framework
can't draw GL, so each debugger becomes:

  1. a *data export* (structured arrays of segments + colors), and
  2. an optional *raster overlay* (project the segments through the camera
     and draw them into a rendered image, host-side numpy).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cge_tpu.camera import Camera, quat_from_euler
from cge_tpu.ops.intersect import closest_hit_chunked
from cge_tpu.ops.shading import compute_reflection_ray
from cge_tpu.render.lights import light_contribution, shadow_visibility
from cge_tpu.render.wavefront import hit_attributes


class DebugRays(NamedTuple):
    """One bounce level of debug rays (drawRay, draw.cpp:212-234 — a segment
    from the origin to o + min(t, 100) * d plus a hit marker)."""

    origin: np.ndarray   # [N, 3]
    dir: np.ndarray      # [N, 3]
    t: np.ndarray        # [N] (clamped to 100 on miss, like drawRay)
    hit: np.ndarray      # [N] bool
    color: np.ndarray    # [N, 3] — shading color on hit, red on miss
                         # (render.cpp:135-147)


def debug_trace(scene, o, d, features, params, key=None, depth=None):
    """Replay the bounce chain for a handful of rays and export every level.

    Mirrors the interactive debug-ray flow (main.cpp:90-104, 391-433 →
    recursiveRayTrace with enableDebugDraw): returns a list of DebugRays,
    one per bounce level, colored like the reference (hit ⇒ shading result,
    or white when shading is off; miss ⇒ red).
    """
    key = jax.random.PRNGKey(0) if key is None else key
    depth = params.ray_depth if depth is None else depth
    o = jnp.atleast_2d(jnp.asarray(o, jnp.float32))
    d = jnp.atleast_2d(jnp.asarray(d, jnp.float32))
    levels = []
    for level in range(depth + 1):
        tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
        ids = closest_hit_chunked(scene, o, d, tmax, params.ray_tile,
                                  params.tri_tile)
        attrs = hit_attributes(scene, o, d, ids, features)
        local = light_contribution(scene, o, d, attrs.t, attrs.normal,
                                   attrs.kd, attrs.ks, attrs.shininess,
                                   features, params,
                                   jax.random.fold_in(key, level))
        hit = np.asarray(attrs.hit)
        if features.enable_shading:
            color = np.asarray(local)
        else:
            color = np.ones((o.shape[0], 3), np.float32)  # white (cpp:139-141)
        color = np.where(hit[:, None], color,
                         np.array([1.0, 0.0, 0.0], np.float32))  # red miss
        t = np.where(hit, np.asarray(attrs.t), 100.0)  # drawRay clamp (cpp:216)
        levels.append(DebugRays(origin=np.asarray(o), dir=np.asarray(d),
                                t=t, hit=hit, color=color))
        if not hit.any():
            break
        ro, rd, _ = compute_reflection_ray(o, d, attrs.t, attrs.normal,
                                           attrs.ks)
        o, d = ro, rd
    return levels


class ShadowRays(NamedTuple):
    """Shadow-ray debug export (light.cpp:63-71): a segment from the shaded
    point to each light sample, red when blocked, light-colored when
    visible."""

    origin: np.ndarray       # [N, 3] shaded points
    target: np.ndarray       # [N, 3] light sample positions
    visible: np.ndarray      # [N] f32 in [0,1]
    color: np.ndarray        # [N, 3]


def debug_shadow_rays(scene, ray_o, ray_d, ray_t, sample_pos, sample_color,
                      features, params) -> ShadowRays:
    vis = np.asarray(shadow_visibility(scene, ray_o, ray_d, ray_t, sample_pos,
                                       features, params))
    dlen = np.linalg.norm(np.asarray(ray_d), axis=-1, keepdims=True)
    p = (np.asarray(ray_o) + np.asarray(ray_d) / dlen
         * (np.asarray(ray_t) * dlen[..., 0] - 1e-5)[..., None])
    color = np.where(vis[:, None] > 0, np.asarray(sample_color),
                     np.array([1.0, 0.0, 0.0], np.float32))
    return ShadowRays(origin=p, target=np.asarray(sample_pos), visible=vis,
                      color=color)


def normal_segments(scene, tri_idx, length=0.2):
    """Per-vertex normal rays of a triangle (the normal-interpolation
    debugger, bounding_volume_hierarchy.cpp:388-392). Returns (starts [3,3],
    ends [3,3])."""
    tri = np.asarray(scene.tris)[tri_idx]
    v = np.asarray(scene.vertices)[tri]
    n = np.asarray(scene.normals)[tri]
    return v, v + length * n


# ---------------------------------------------------------------------------
# AABB / segment rasterization
# ---------------------------------------------------------------------------

_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0),
          (4, 5), (5, 7), (7, 6), (6, 4),
          (0, 4), (1, 5), (2, 6), (3, 7)]


def aabb_segments(lo, hi):
    """Wireframe segments of AABBs (drawAABB, draw.cpp:184-197).

    lo, hi: [B, 3]. Returns (a [B*12, 3], b [B*12, 3])."""
    lo = np.atleast_2d(np.asarray(lo))
    hi = np.atleast_2d(np.asarray(hi))
    B = lo.shape[0]
    corners = np.stack([np.where([(i >> a) & 1 for a in range(3)], hi[b], lo[b])
                        for b in range(B) for i in range(8)])
    corners = corners.reshape(B, 8, 3)
    a = corners[:, [e[0] for e in _EDGES]]
    b = corners[:, [e[1] for e in _EDGES]]
    return a.reshape(-1, 3), b.reshape(-1, 3)


def project_points(camera: Camera, points, width: int, height: int):
    """World → pixel projection (the inverse of Trackball::generateRay,
    trackball.cpp:101-110, including the -x quirk). Returns (px [N,2] float,
    in_front [N] bool)."""
    p = np.atleast_2d(np.asarray(points, np.float32))
    q = np.asarray(quat_from_euler(jnp.asarray(camera.rotation, jnp.float32)))
    w, x, y, z = q
    # rotate by conjugate (world -> camera)
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)],
        [2 * (x * y - w * z), 1 - 2 * (x * x + z * z), 2 * (y * z + w * x)],
        [2 * (x * z + w * y), 2 * (y * z - w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    pos = np.asarray(camera.position())
    cam = (p - pos) @ R.T
    zc = cam[:, 2]
    in_front = zc > 1e-6
    zs = np.where(in_front, zc, 1.0)
    half_w = float(np.asarray(camera.half_screen_w))
    half_h = float(np.asarray(camera.half_screen_h))
    ndc_x = -cam[:, 0] / (zs * half_w)        # -x quirk inverted
    ndc_y = cam[:, 1] / (zs * half_h)
    px = (ndc_x + 1.0) * 0.5 * width
    py = (1.0 - (ndc_y + 1.0) * 0.5) * height   # image row 0 = top
    return np.stack([px, py], axis=-1), in_front


def draw_segments(image, camera: Camera, a, b, color=(0.0, 1.0, 0.0),
                  samples_per_seg: int = 64):
    """Overlay 3-D line segments onto a rendered image (row 0 = top).

    The numpy stand-in for the GL wireframe overlays: each segment is
    point-sampled and splatted. Returns a copy of the image."""
    img = np.array(image, np.float32, copy=True)
    h, w = img.shape[:2]
    pa, fa = project_points(camera, a, w, h)
    pb, fb = project_points(camera, b, w, h)
    ok = fa & fb
    ts = np.linspace(0.0, 1.0, samples_per_seg, dtype=np.float32)
    pts = (pa[ok, None, :] * (1 - ts[None, :, None])
           + pb[ok, None, :] * ts[None, :, None]).reshape(-1, 2)
    xi = np.round(pts[:, 0]).astype(int)
    yi = np.round(pts[:, 1]).astype(int)
    keep = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    img[yi[keep], xi[keep]] = np.asarray(color, np.float32)
    return img
