#!/usr/bin/env python
"""Deterministic large-OBJ generator: the dragon stand-in.

The reference's Dragon scene (src/scene.cpp:70-73) loads ``dragon.obj`` —
an asset that is NOT shipped in its data/ directory (loadMesh would throw,
framework/src/mesh.cpp:54-57). To still exercise real large-asset behavior
end-to-end (OBJ *text* parsing at scale, vertex dedup, quad triangulation,
material runs, BVH/cluster build on 500k+ triangles, the HBM-resident
sweep), this tool writes a genuine Wavefront OBJ/MTL pair to disk: a
serpentine swept tube ("dragon") with scale-like displacement, tapered
head/tail, two material runs, and quad faces (so the loader's
shortest-diagonal quad split runs at scale — tiny_obj_loader.h:1428-1536).

Fully deterministic (no RNG): the same parameters always produce a
byte-identical file, so goldens and benchmarks are reproducible.

Usage: python tools/make_large_asset.py [out.obj] [rings] [segments]
Default 801 x 384 grid = 614,400 triangles (307,584 vertices, ~45 MB).
"""

from __future__ import annotations

import io
import os
import sys

import numpy as np


def dragon_grid(rings: int = 801, segments: int = 384):
    """Vertex/normal/uv grids [U, V, 3|2] of the swept-tube dragon."""
    t = np.linspace(0.0, 1.0, rings, dtype=np.float64)        # along spine
    phi = np.linspace(0.0, 2 * np.pi, segments, endpoint=False)

    # spine: an inward-tapering coil with a vertical wiggle
    theta = 4.0 * np.pi * t
    r_sp = 1.0 - 0.55 * t
    spine = np.stack([r_sp * np.cos(theta),
                      0.8 * t - 0.4 + 0.15 * np.sin(6 * np.pi * t),
                      r_sp * np.sin(theta)], axis=1)          # [U, 3]

    # frame: tangent via central differences, then (normal, binormal)
    tang = np.gradient(spine, t, axis=0)
    tang /= np.linalg.norm(tang, axis=1, keepdims=True)
    up = np.array([0.0, 1.0, 0.0])
    nrm = np.cross(tang, up)
    bad = np.linalg.norm(nrm, axis=1) < 1e-6
    nrm[bad] = np.array([1.0, 0.0, 0.0])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    binm = np.cross(tang, nrm)
    binm /= np.linalg.norm(binm, axis=1, keepdims=True)

    # tube radius: sine taper (snout/tail) + a head bulge near t=0.06
    r0 = 0.16 * np.sin(np.pi * t) ** 0.35
    r0 = r0 + 0.10 * np.exp(-((t - 0.06) / 0.035) ** 2)

    # scale-like displacement over (t, phi)
    tt = t[:, None]
    pp = phi[None, :]
    disp = 1.0 + 0.06 * np.sin(40 * np.pi * tt + 3 * pp) * np.sin(5 * pp)
    rad = r0[:, None] * disp                                  # [U, V]

    circ = (np.cos(pp)[..., None] * nrm[:, None, :]
            + np.sin(pp)[..., None] * binm[:, None, :])       # [U, V, 3]
    verts = spine[:, None, :] + rad[..., None] * circ         # [U, V, 3]

    # grid normals: cross of central-difference partials (V axis wraps)
    du = np.gradient(verts, axis=0)
    dv = (np.roll(verts, -1, axis=1) - np.roll(verts, 1, axis=1)) * 0.5
    vn = np.cross(dv, du)
    ln = np.linalg.norm(vn, axis=2, keepdims=True)
    vn = vn / np.maximum(ln, 1e-12)

    uv = np.stack(np.broadcast_arrays(tt, pp / (2 * np.pi)), axis=2)
    return (verts.astype(np.float32), vn.astype(np.float32),
            uv.astype(np.float32))


def write_obj(path: str, rings: int = 801, segments: int = 384) -> dict:
    """Writes the OBJ + MTL pair; returns stats. Quad faces with wrap in
    the segment axis; two usemtl runs (body, belly) split at mid-spine."""
    verts, vn, uv = dragon_grid(rings, segments)
    U, V, _ = verts.shape

    mtl_path = os.path.splitext(path)[0] + ".mtl"
    with open(mtl_path, "w") as f:
        f.write("newmtl dragonBody\nKd 0.35 0.55 0.30\nKs 0.25 0.25 0.25\n"
                "Ns 28.0\nd 1.0\n\n"
                "newmtl dragonBelly\nKd 0.75 0.70 0.45\nKs 0.05 0.05 0.05\n"
                "Ns 6.0\nd 1.0\n")

    buf = io.StringIO()
    buf.write("# cge_tpu dragon stand-in (deterministic, generated)\n")
    buf.write(f"mtllib {os.path.basename(mtl_path)}\no dragon\n")

    flat_v = verts.reshape(-1, 3)
    flat_n = vn.reshape(-1, 3)
    flat_t = uv.reshape(-1, 2)
    for row in flat_v:
        buf.write(f"v {row[0]:.5f} {row[1]:.5f} {row[2]:.5f}\n")
    for row in flat_t:
        buf.write(f"vt {row[0]:.5f} {row[1]:.5f}\n")
    for row in flat_n:
        buf.write(f"vn {row[0]:.5f} {row[1]:.5f} {row[2]:.5f}\n")

    # quad faces: (i,j) (i+1,j) (i+1,j+1) (i,j+1), wrap j; 1-indexed
    i = np.arange(U - 1)[:, None]
    j = np.arange(V)[None, :]
    jn = (j + 1) % V
    a = (i * V + j + 1).ravel()
    b = ((i + 1) * V + j + 1).ravel()
    c = ((i + 1) * V + jn + 1).ravel()
    d = (i * V + jn + 1).ravel()

    half = len(a) // 2
    buf.write("usemtl dragonBody\n")
    for k in range(len(a)):
        if k == half:
            buf.write("usemtl dragonBelly\n")
        buf.write(f"f {a[k]}/{a[k]}/{a[k]} {b[k]}/{b[k]}/{b[k]} "
                  f"{c[k]}/{c[k]}/{c[k]} {d[k]}/{d[k]}/{d[k]}\n")

    with open(path, "w") as f:
        f.write(buf.getvalue())
    return {"vertices": U * V, "quads": (U - 1) * V,
            "triangles": 2 * (U - 1) * V,
            "bytes": os.path.getsize(path)}


def ensure_asset(path: str, rings: int = 801, segments: int = 384) -> dict:
    """Generate only if missing (the file is deterministic)."""
    if os.path.exists(path) and os.path.exists(
            os.path.splitext(path)[0] + ".mtl"):
        return {"cached": True, "bytes": os.path.getsize(path)}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    return write_obj(path, rings, segments)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "dragon_standin.obj")
    rings = int(sys.argv[2]) if len(sys.argv) > 2 else 801
    segments = int(sys.argv[3]) if len(sys.argv) > 3 else 384
    print(write_obj(out, rings, segments))
