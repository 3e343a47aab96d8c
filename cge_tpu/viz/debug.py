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
    """Replay the bounce recursion for a handful of rays, every level and
    every branch (mirror AND transparency continuation).

    Mirrors the interactive debug-ray flow (main.cpp:90-104, 391-433 →
    recursiveRayTrace with enableDebugDraw, which draws the rays of every
    recursive call): returns a list of DebugRays, one per bounce level,
    colored like the reference (hit ⇒ shading result, or white when shading
    is off; miss ⇒ red). Child spawning follows the feature-set radiance
    flow exactly:
      - REC on: mirror ray when ks != 0 (render.cpp:100); plus, when the
        hit material has transparency != 1, the second-block continuation
        ray (render.cpp:108-111) — and with REC off TRANS on, only that
        continuation (render.cpp:42-43). Dead branches are compacted away
        host-side (this is eager debug code, dynamic shapes are fine)."""
    key = jax.random.PRNGKey(0) if key is None else key
    depth = params.ray_depth if depth is None else depth
    o = np.atleast_2d(np.asarray(o, np.float32))
    d = np.atleast_2d(np.asarray(d, np.float32))
    levels = []
    for level in range(depth + 1):
        oj = jnp.asarray(o)
        dj = jnp.asarray(d)
        tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
        ids = closest_hit_chunked(scene, oj, dj, tmax, params.ray_tile,
                                  params.tri_tile)
        attrs = hit_attributes(scene, oj, dj, ids, features)
        local = light_contribution(scene, oj, dj, attrs.t, attrs.normal,
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
        levels.append(DebugRays(origin=o, dir=d, t=t, hit=hit, color=color))
        if not hit.any() or level == depth:
            break

        # spawn children per the feature-set radiance flow
        children_o, children_d = [], []
        trans = np.asarray(attrs.transparency)
        trans_ne1 = trans != 1.0
        valid_mirror = np.asarray(jnp.any(attrs.ks != 0.0, axis=-1))
        if features.enable_recursive:
            mo, md, _ = compute_reflection_ray(oj, dj, attrs.t, attrs.normal,
                                               attrs.ks)
            mo, md = np.asarray(mo), np.asarray(md)
            take = hit & valid_mirror
            children_o.append(mo[take])
            children_d.append(md[take])
        if features.enable_transparency or (features.enable_recursive
                                            and trans_ne1.any()):
            # continuation ray: origin = (1e-5 + t) * d + o, same direction
            co = (1e-5 + np.asarray(attrs.t))[:, None] * d + o
            take = hit & trans_ne1
            children_o.append(co[take])
            children_d.append(d[take])
        if not children_o:
            break
        o = np.concatenate(children_o)
        d = np.concatenate(children_d)
        if o.shape[0] == 0:
            break
    return levels


def debug_ray_samples(nx, ny, camera: Camera, params, width=800, height=800,
                      key=None):
    """The R-key MSAA debug sample set (main.cpp:95-98): the jittered
    sub-pixel ray fan at normalized cursor pos (nx, ny), using the debug
    pixel size windowSize * 0.00005 the reference hardcodes there (window
    default 800x800, main.cpp:55). Returns (o [S,3], d [S,3]) with
    S = rays_per_pixel_side**2."""
    from cge_tpu.render.sampling import msaa_sample_positions

    key = jax.random.PRNGKey(7) if key is None else key
    n = params.rays_per_pixel_side
    pixel_size = jnp.asarray([width * 0.00005, height * 0.00005], jnp.float32)
    grid = jnp.asarray([[nx, ny]], jnp.float32)
    pos = msaa_sample_positions(grid, pixel_size, n, key)
    return camera.generate_rays(pos.reshape(-1, 2))


def debug_dof_rays(nx, ny, camera: Camera, params, key=None):
    """The R-key DoF debug sample set (main.cpp:99-100): samples_dof
    disk-jittered origins converging on the focal-plane point of the cursor
    ray. Returns (o [S,3], d [S,3])."""
    from cge_tpu.render.sampling import dof_rays

    key = jax.random.PRNGKey(9) if key is None else key
    grid = jnp.asarray([[nx, ny]], jnp.float32)
    o, d = dof_rays(grid, camera, params.focus_plane_distance,
                    params.blur_strength, params.samples_dof, key)
    return o.reshape(-1, 3), d.reshape(-1, 3)


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


class TraversalDebug(NamedTuple):
    """Visited-node export of one debug ray's accel traversal (the
    debugBVHTraversal overlay, bounding_volume_hierarchy.cpp:338-360):
      - visited: children whose AABB passed the (ray.t = FLT_MAX) box test
        as the stack walk reached their parent — drawn gray wireframe there;
      - dead: internal nodes where BOTH children missed — drawn red there;
      - tri: the winning primitive's triangle corners (debugDrawTriangle at
        cpp:376-378), or None on miss / sphere hit.
    Depth arrays let a UI filter by recursion level (the reference gates all
    draws on m_recursionLevel == RECURSION_LEVEL, where m_recursionLevel is
    initialized to 0 and never updated during traversal (cpp:176, 339) — so
    its level slider only ever draws at 0; see AppState for how the app
    mirrors that quirk and extends it)."""

    visited_lo: np.ndarray   # [K, 3]
    visited_hi: np.ndarray   # [K, 3]
    visited_depth: np.ndarray  # [K] i32 (depth of the drawn child node)
    dead_lo: np.ndarray      # [M, 3]
    dead_hi: np.ndarray      # [M, 3]
    dead_depth: np.ndarray   # [M] i32
    tri: np.ndarray | None   # [3, 3] or None


def _aabb_hit_host(o, d, lo, hi):
    """intersectRayWithShape(AABB) at ray.t == FLT_MAX (the traversal's
    child test, cpp:334-352) — host-side scalar mirror of
    cge_tpu.ops.bvh_traverse._aabb_hit_tmax_inf."""
    FLT_MAX = np.float32(3.4028234663852886e38)
    FLT_MIN = np.float32(1.1754943508222875e-38)
    zero = d == 0
    safe_d = np.where(zero, 1.0, d)
    t_l = np.where(zero, FLT_MIN, (lo - o) / safe_d)
    t_u = np.where(zero, FLT_MAX, (hi - o) / safe_d)
    tnear = np.minimum(t_l, t_u).max()
    tfar = np.maximum(t_l, t_u).min()
    if tnear < 0:
        ok, t = tfar > 0, tfar
    else:
        ok, t = tnear <= tfar, tnear
    return bool(ok and t >= 0)


def traversal_debug(bvh, scene, o, d) -> TraversalDebug:
    """Replay the reference's stack traversal (cpp:312-362) for ONE debug
    ray, recording exactly what the GL debugger would draw. Host-side and
    eager — this is a debug tool, one ray at a time, like the original."""
    o = np.asarray(o, np.float32).reshape(3)
    d = np.asarray(d, np.float32).reshape(3)
    meta = bvh.node_meta
    vis, dead = [], []
    best_t = np.float32(np.inf)
    best_perm = -1
    verts = np.asarray(scene.vertices)
    tris = np.asarray(scene.tris)
    stack = [bvh.root]
    while stack:
        node = stack.pop()
        if meta[node, 0]:                            # leaf (cpp:319-327)
            for p in range(meta[node, 2], meta[node, 3]):
                if bvh.perm_is_sphere[p]:
                    c = np.asarray(scene.sph_center)[bvh.perm_index[p]]
                    r = float(np.asarray(
                        scene.sph_radius)[bvh.perm_index[p]])
                    oc = o - c
                    b = 2.0 * float(d @ oc)
                    cc = float(oc @ oc) - r * r
                    disc = b * b - 4.0 * cc
                    if disc < 0:
                        continue
                    sq = np.sqrt(disc)
                    t0, t1 = (-b - sq) / 2.0, (-b + sq) / 2.0
                    t = t0 if t0 >= 0 else t1
                    if t >= 0 and t < best_t:        # strict (sphere rule)
                        best_t, best_perm = np.float32(t), p
                else:
                    v0, v1, v2 = verts[tris[bvh.perm_index[p]]]
                    n = np.cross(v1 - v0, v2 - v0)
                    nn = np.linalg.norm(n)
                    if nn == 0:
                        continue
                    n = n / nn
                    denom = float(n @ d)
                    t = (float(n @ v0) - float(n @ o)) / denom \
                        if denom != 0 else np.inf
                    if not np.isfinite(t) or t < 0 or t > best_t:
                        continue
                    pt = o + t * d
                    if (np.dot(np.cross(v1 - v0, pt - v0), n) >= 0
                            and np.dot(np.cross(v2 - v1, pt - v1), n) >= 0
                            and np.dot(np.cross(v0 - v2, pt - v2), n) >= 0):
                        best_t, best_perm = np.float32(t), p  # last-wins <=
            continue
        left, right = int(meta[node, 4]), int(meta[node, 5])
        lhit = _aabb_hit_host(o, d, bvh.node_lo[left], bvh.node_hi[left])
        rhit = _aabb_hit_host(o, d, bvh.node_lo[right], bvh.node_hi[right])
        if lhit:                                     # gray draw (cpp:338-342)
            vis.append((bvh.node_lo[left], bvh.node_hi[left],
                        meta[left, 1]))
        if rhit:                                     # gray draw (cpp:346-350)
            vis.append((bvh.node_lo[right], bvh.node_hi[right],
                        meta[right, 1]))
        if lhit:
            stack.append(left)                       # left then right push:
        if rhit:
            stack.append(right)                      # right pops first
        if not lhit and not rhit:                    # red parent (cpp:355-359)
            dead.append((bvh.node_lo[node], bvh.node_hi[node],
                         meta[node, 1]))

    tri = None
    if best_perm >= 0 and not bvh.perm_is_sphere[best_perm]:
        tri = verts[tris[bvh.perm_index[best_perm]]].astype(np.float32)

    def pack(items):
        if not items:
            z = np.zeros((0, 3), np.float32)
            return z, z, np.zeros(0, np.int32)
        return (np.asarray([i[0] for i in items], np.float32),
                np.asarray([i[1] for i in items], np.float32),
                np.asarray([i[2] for i in items], np.int32))

    vlo, vhi, vd = pack(vis)
    dlo, dhi, dd = pack(dead)
    return TraversalDebug(visited_lo=vlo, visited_hi=vhi, visited_depth=vd,
                          dead_lo=dlo, dead_hi=dhi, dead_depth=dd, tri=tri)


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


def _camera_space(camera: Camera, points):
    """World → camera-space coords (the inverse of the trackball rotation)."""
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
    return (p - pos) @ R.T


def project_points(camera: Camera, points, width: int, height: int):
    """World → pixel projection (the inverse of Trackball::generateRay,
    trackball.cpp:101-110, including the -x quirk). Returns (px [N,2] float,
    in_front [N] bool)."""
    cam = _camera_space(camera, points)
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
                  samples_per_seg: int | None = None):
    """Overlay 3-D line segments onto a rendered image (row 0 = top).

    The numpy stand-in for the GL wireframe overlays: each segment is
    point-sampled and splatted. Sampling defaults to 8x the image diagonal
    so even a drawRay-style 100-unit miss segment (debug rays clamp t to
    100, draw.cpp:216) leaves no pixel gaps where it crosses the view.
    Returns a copy of the image."""
    img = np.array(image, np.float32, copy=True)
    h, w = img.shape[:2]
    if samples_per_seg is None:
        samples_per_seg = 8 * max(w, h)
    a = np.atleast_2d(np.asarray(a, np.float32))
    b = np.atleast_2d(np.asarray(b, np.float32))
    # clip each segment to the camera near plane (z = eps in camera space)
    # instead of dropping it — debug eye rays START at the camera and miss
    # rays extend 100 units (often past the frustum)
    eps = 1e-4
    a0, b0 = a, b
    za = _camera_space(camera, a0)[:, 2]
    zb = _camera_space(camera, b0)[:, 2]
    ok = np.maximum(za, zb) > eps
    dz = np.where(zb == za, 1.0, zb - za)
    ta = np.clip((eps - za) / dz, 0.0, 1.0)
    tb = np.clip((eps - zb) / -dz, 0.0, 1.0)
    a = np.where((za < eps)[:, None], a0 + ta[:, None] * (b0 - a0), a0)
    b = np.where((zb < eps)[:, None], b0 + tb[:, None] * (a0 - b0), b0)
    pa, _ = project_points(camera, a, w, h)
    pb, _ = project_points(camera, b, w, h)
    ts = np.linspace(0.0, 1.0, samples_per_seg, dtype=np.float32)
    pts = (pa[ok, None, :] * (1 - ts[None, :, None])
           + pb[ok, None, :] * ts[None, :, None]).reshape(-1, 2)
    xi = np.round(pts[:, 0]).astype(int)
    yi = np.round(pts[:, 1]).astype(int)
    keep = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    img[yi[keep], xi[keep]] = np.asarray(color, np.float32)
    return img
