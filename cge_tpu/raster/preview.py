"""Rasterization-preview composition.

Mirrors the reference's Rasterization view frame
(/root/reference/src/main.cpp:380-464):
  drawSceneOpenGL (608-658): GL point-light setup + lit scene meshes;
  scene spheres drawn as tessellated quadrics (draw.cpp:79-97);
  drawLightsOpenGL (555-605): unlit overlays — a 0.01-radius sphere per
  point light, endpoint spheres + a colored line per segment light, a
  Gouraud quad per parallelogram light, and a blue 0.01 sphere at the
  trackball's look-at point;
  clear color black (main.cpp:373).

Everything is assembled into ONE vertex/triangle/color soup and rasterized
in a single z-buffered pass — the batched equivalent of the GL draw calls.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from cge_tpu.raster.lighting import gl_point_lights, gl_vertex_colors
from cge_tpu.raster.matrices import camera_matrices, project_vertices
from cge_tpu.raster.rasterize import rasterize, shade_gouraud


def icosphere(subdiv: int = 2):
    """Unit icosphere (host-side, cached): verts [V, 3], tris [T, 3]."""
    if subdiv in _ICO_CACHE:
        return _ICO_CACHE[subdiv]
    t = (1.0 + 5 ** 0.5) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], np.float32)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], np.int32)
    for _ in range(subdiv):
        cache = {}
        vlist = list(verts)
        new_faces = []

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = vlist[i] + vlist[j]
                m = m / np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m.astype(np.float32))
            return cache[key]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c],
                          [ab, bc, ca]]
        verts = np.asarray(vlist, np.float32)
        faces = np.asarray(new_faces, np.int32)
    _ICO_CACHE[subdiv] = (verts, faces)
    return verts, faces


_ICO_CACHE: dict = {}


class _Soup:
    """Host-side geometry accumulator: world verts, tris, vertex colors."""

    def __init__(self):
        self.verts, self.tris, self.colors = [], [], []
        self._off = 0

    def add(self, verts, tris, colors):
        self.verts.append(np.asarray(verts, np.float32))
        self.tris.append(np.asarray(tris, np.int32) + self._off)
        self.colors.append(np.asarray(colors, np.float32))
        self._off += len(verts)

    def arrays(self):
        return (np.concatenate(self.verts), np.concatenate(self.tris),
                np.concatenate(self.colors))


def _add_marker_sphere(soup, center, radius, color):
    v, f = icosphere(1)
    soup.add(v * radius + np.asarray(center, np.float32), f,
             np.broadcast_to(np.asarray(color, np.float32), (len(v), 3)))


def _add_line(soup, p0, p1, c0, c1, eye, px_world):
    """A GL line as a thin camera-facing quad (~1 px wide)."""
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    seg = p1 - p0
    view = 0.5 * (p0 + p1) - np.asarray(eye, np.float32)
    side = np.cross(seg, view)
    nrm = np.linalg.norm(side)
    if nrm < 1e-12:
        return
    side = side / nrm * (0.5 * px_world)
    soup.add(np.stack([p0 - side, p0 + side, p1 + side, p1 - side]),
             np.array([[0, 1, 2], [0, 2, 3]], np.int32),
             np.stack([c0, c0, c1, c1]).astype(np.float32))


def render_preview(scene, camera, width: int, height: int,
                   show_lights: bool = True, sphere_subdiv: int = 3):
    """Rasterized preview frame [H, W, 3] f32, row 0 = top of the image
    (flipped from GL window coords like Screen::setPixel, screen.cpp:41-47).
    """
    soup = _Soup()

    # --- lit scene triangles
    tri_mask = np.asarray(scene.tri_mask)
    tris = np.asarray(scene.tris)[tri_mask]
    soup.add(np.asarray(scene.vertices), tris,
             np.asarray(gl_vertex_colors(scene)))

    # --- lit scene spheres: tessellated like gluSphere (draw.cpp:79-97),
    # per-vertex GL diffuse lighting with the sphere's kd
    lpos, lcol, lmask = (np.asarray(x) for x in gl_point_lights(scene))
    lcol = np.clip(lcol, 0.0, 1.0)
    sph_mask = np.asarray(scene.sph_mask)
    iv, it = icosphere(sphere_subdiv)
    for si in np.nonzero(sph_mask)[0]:
        c = np.asarray(scene.sph_center)[si]
        r = float(np.asarray(scene.sph_radius)[si])
        kd = np.asarray(scene.mat_kd)[int(np.asarray(scene.sph_mat)[si])]
        verts = iv * r + c
        ldir = lpos[None] - verts[:, None]
        ldir /= np.maximum(np.linalg.norm(ldir, axis=-1, keepdims=True),
                           1e-20)
        ndl = np.maximum((iv[:, None] * ldir).sum(-1), 0.0)
        col = (ndl[..., None] * lcol[None] * lmask[None, :, None]).sum(1)
        soup.add(verts, it, np.clip(kd[None] * col, 0.0, 1.0))

    eye = np.asarray(camera.position())
    if show_lights:
        # unlit light markers (drawLightsOpenGL, main.cpp:555-605)
        look = np.asarray(camera.look_at, np.float32)
        dist = float(np.linalg.norm(eye - look)) + 1e-6
        px_world = dist * 2.0 * float(np.tan(camera.fovy / 2.0)) / height
        pm = np.asarray(scene.point_mask)
        for i in np.nonzero(pm)[0]:
            _add_marker_sphere(soup, np.asarray(scene.point_pos)[i], 0.01,
                               np.asarray(scene.point_color)[i])
        sm = np.asarray(scene.seg_mask)
        for i in np.nonzero(sm)[0]:
            p0 = np.asarray(scene.seg_p0)[i]
            p1 = np.asarray(scene.seg_p1)[i]
            c0 = np.asarray(scene.seg_c0)[i]
            c1 = np.asarray(scene.seg_c1)[i]
            _add_line(soup, p0, p1, c0, c1, eye, px_world)
            _add_marker_sphere(soup, p0, 0.01, c0)
            _add_marker_sphere(soup, p1, 0.01, c1)
        qm = np.asarray(scene.par_mask)
        for i in np.nonzero(qm)[0]:
            v0 = np.asarray(scene.par_v0)[i]
            e01 = np.asarray(scene.par_e01)[i]
            e02 = np.asarray(scene.par_e02)[i]
            cs = [np.asarray(scene.par_c0)[i], np.asarray(scene.par_c1)[i],
                  np.asarray(scene.par_c3)[i], np.asarray(scene.par_c2)[i]]
            # GL_QUADS vertex order v0, v0+e01, v0+e01+e02, v0+e02 with
            # colors c0, c1, c3, c2 (main.cpp:600-612)
            quad = np.stack([v0, v0 + e01, v0 + e01 + e02, v0 + e02])
            soup.add(quad, np.array([[0, 1, 2], [0, 2, 3]], np.int32),
                     np.stack(cs).astype(np.float32))
        # look-at marker (main.cpp:603-605)
        _add_marker_sphere(soup, look, 0.01, (0.2, 0.2, 1.0))

    verts, tris_all, colors = soup.arrays()
    view, proj = camera_matrices(camera, width, height)
    xy, z, w = project_vertices(jnp.asarray(verts), view, proj, width, height)
    tri_id, _ = rasterize(xy, z, w, jnp.asarray(tris_all), width, height)
    img = shade_gouraud(tri_id, xy, z, jnp.asarray(tris_all),
                        jnp.asarray(colors))
    return jnp.flipud(img)
