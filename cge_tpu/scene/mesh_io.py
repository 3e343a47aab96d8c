"""Wavefront OBJ/MTL loader.

Pure-Python re-implementation of the reference's mesh loading pipeline:
tinyobjloader (framework/third_party/tinyobjloader) followed by
``loadMesh`` (/root/reference/framework/src/mesh.cpp:52-149). Replicated
semantics:

  - shapes split on ``o``/``g`` statements; faces triangulated like
    tinyobj's "simple" method: quads split along the *shortest diagonal*
    (tiny_obj_loader.h:1428-1536); tris passed through. N-gons (n>4) use a
    fan (the shipped assets contain none; tinyobj would use earcut).
  - each shape is further split into sub-meshes by *runs* of material id,
    replicating the exact (quirky) loop at mesh.cpp:76-142 — including the
    edge case where the final triangle is merged into the previous run.
  - per-submesh vertex dedup on exact (position, normal, texcoord) equality
    (mesh.cpp:88, 111-119).
  - geometric-normal fallback per corner when the face has no normal index
    (mesh.cpp:93, 104-107).
  - material defaults per tinyobj InitMaterial (diffuse=0, shininess=1,
    dissolve=1) and the materialID==-1 fallback kd=1/ks=0/shininess=1
    (mesh.cpp:124-127); transparency = dissolve ``d`` (mesh.cpp:136).
  - optional centerAndScaleToUnitMesh: translate to vertex centroid, scale
    by max distance (mesh.cpp:151-176).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from cge_tpu.scene.image_io import Image, load_image


@dataclasses.dataclass
class Material:
    """framework/include/framework/mesh.h:22-34."""

    kd: np.ndarray = dataclasses.field(default_factory=lambda: np.ones(3, np.float32))
    ks: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))
    shininess: float = 1.0
    transparency: float = 1.0
    kd_texture: Optional[Image] = None


@dataclasses.dataclass
class SubMesh:
    """framework/include/framework/mesh.h:36-43: SoA vertices + triangles."""

    positions: np.ndarray  # [V, 3] f32
    normals: np.ndarray    # [V, 3] f32
    texcoords: np.ndarray  # [V, 2] f32
    triangles: np.ndarray  # [T, 3] u32
    material: Material


def _parse_mtl(path: str) -> dict:
    """Parse a .mtl file; returns name -> dict. tinyobj field subset."""
    materials = {}
    cur = None
    if not os.path.exists(path):
        return materials
    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key = parts[0]
            if key == "newmtl":
                name = line[len("newmtl"):].strip()
                cur = {
                    "kd": np.zeros(3, np.float32),
                    "ks": np.zeros(3, np.float32),
                    "shininess": 1.0,
                    "dissolve": 1.0,
                    "map_kd": None,
                }
                materials[name] = cur
            elif cur is None:
                continue
            elif key == "Kd" and len(parts) >= 4:
                cur["kd"] = np.array([float(parts[1]), float(parts[2]), float(parts[3])], np.float32)
            elif key == "Ks" and len(parts) >= 4:
                cur["ks"] = np.array([float(parts[1]), float(parts[2]), float(parts[3])], np.float32)
            elif key == "Ns" and len(parts) >= 2:
                cur["shininess"] = float(parts[1])
            elif key == "d" and len(parts) >= 2:
                cur["dissolve"] = float(parts[1])
            elif key == "Tr" and len(parts) >= 2:
                # tinyobj maps Tr to 1 - dissolve (when d not also given)
                cur["dissolve"] = 1.0 - float(parts[1])
            elif key == "map_Kd":
                cur["map_kd"] = line[len("map_Kd"):].strip()
    return materials


def _parse_index(token: str, nv: int, nvt: int, nvn: int):
    """OBJ face corner 'v', 'v/vt', 'v//vn', 'v/vt/vn'; 1-based, negatives
    relative. Returns 0-based (v_idx, vt_idx, vn_idx) with -1 for absent."""
    fields = token.split("/")

    def fix(idx_str, n):
        if idx_str == "" or idx_str is None:
            return -1
        i = int(idx_str)
        return (i - 1) if i > 0 else (n + i)

    v = fix(fields[0], nv)
    vt = fix(fields[1], nvt) if len(fields) > 1 else -1
    vn = fix(fields[2], nvn) if len(fields) > 2 else -1
    return v, vt, vn


def load_mesh(path: str, center_and_normalize: bool = False) -> list[SubMesh]:
    """loadMesh (mesh.cpp:52-149).

    Dispatches to the native C++ loader (cge_tpu.native, the analogue of the
    reference's tinyobjloader+loadMesh native pipeline) when available;
    this pure-Python implementation is the fallback and the semantic oracle
    (equivalence tested in tests/test_native.py)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"File {path} does not exist.")
    native = _load_mesh_native(path, center_and_normalize)
    if native is not None:
        return native
    return _load_mesh_python(path, center_and_normalize)


def _load_mesh_native(path: str, center_and_normalize: bool):
    from cge_tpu import native as cge_native

    raw = cge_native.load_obj_native(path, center_and_normalize)
    if raw is None:
        return None
    base_dir = os.path.dirname(os.path.abspath(path))
    texture_cache: dict = {}
    out: list[SubMesh] = []
    for pos, nrm, uv, tris, mat in raw:
        tex = None
        if mat["map_kd"]:
            tex_path = os.path.join(base_dir, mat["map_kd"])
            if tex_path not in texture_cache:
                texture_cache[tex_path] = load_image(tex_path)
            tex = texture_cache[tex_path]
        material = Material(
            kd=np.asarray(mat["kd"], np.float32),
            ks=np.asarray(mat["ks"], np.float32),
            shininess=float(mat["shininess"]),
            transparency=float(mat["dissolve"]),
            kd_texture=tex)
        out.append(SubMesh(positions=pos, normals=nrm, texcoords=uv,
                           triangles=tris, material=material))
    return out


def _load_mesh_python(path: str, center_and_normalize: bool) -> list[SubMesh]:
    base_dir = os.path.dirname(os.path.abspath(path))

    verts: list = []
    norms: list = []
    uvs: list = []
    materials_by_name: dict = {}
    material_list: list = []       # ordered list of material dicts
    material_index: dict = {}      # name -> id

    # shapes: each is (corner_indices [N_tri, 3, 3], material_ids [N_tri])
    shapes: list = []
    cur_tris: list = []
    cur_mat_ids: list = []
    cur_material_id = -1

    def flush_shape():
        nonlocal cur_tris, cur_mat_ids
        if cur_tris:
            shapes.append((cur_tris, cur_mat_ids))
        cur_tris, cur_mat_ids = [], []

    with open(path, "r", errors="replace") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            key = parts[0]
            if key == "v":
                verts.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif key == "vn":
                norms.append((float(parts[1]), float(parts[2]), float(parts[3])))
            elif key == "vt":
                uvs.append((float(parts[1]), float(parts[2])))
            elif key == "f":
                corners = [
                    _parse_index(tok, len(verts), len(uvs), len(norms))
                    for tok in parts[1:]
                ]
                n = len(corners)
                if n == 3:
                    tris = [(corners[0], corners[1], corners[2])]
                elif n == 4:
                    # shortest-diagonal split (tiny_obj_loader.h:1428-1536)
                    p = [np.asarray(verts[c[0]], np.float64) for c in corners]
                    sqr02 = float(np.sum((p[2] - p[0]) ** 2))
                    sqr13 = float(np.sum((p[3] - p[1]) ** 2))
                    if sqr02 < sqr13:
                        tris = [(corners[0], corners[1], corners[2]),
                                (corners[0], corners[2], corners[3])]
                    else:
                        tris = [(corners[0], corners[1], corners[3]),
                                (corners[1], corners[2], corners[3])]
                else:
                    tris = [(corners[0], corners[i], corners[i + 1])
                            for i in range(1, n - 1)]
                for t in tris:
                    cur_tris.append(t)
                    cur_mat_ids.append(cur_material_id)
            elif key in ("o", "g"):
                flush_shape()
            elif key == "usemtl":
                name = line[len("usemtl"):].strip()
                cur_material_id = material_index.get(name, -1)
            elif key == "mtllib":
                mtl_name = line[len("mtllib"):].strip()
                parsed = _parse_mtl(os.path.join(base_dir, mtl_name))
                for name, mat in parsed.items():
                    if name not in material_index:
                        material_index[name] = len(material_list)
                        material_list.append(mat)
                materials_by_name.update(parsed)
    flush_shape()

    verts_np = np.asarray(verts, np.float32).reshape(-1, 3)
    norms_np = np.asarray(norms, np.float32).reshape(-1, 3) if norms else np.zeros((0, 3), np.float32)
    uvs_np = np.asarray(uvs, np.float32).reshape(-1, 2) if uvs else np.zeros((0, 2), np.float32)

    out: list[SubMesh] = []
    texture_cache: dict = {}

    for tri_corners, mat_ids in shapes:
        num_tris = len(tri_corners)
        # replicate the run-splitting loop at mesh.cpp:76-142
        start = 0
        prev_mat = mat_ids[0]
        end = 0
        while end < num_tris:
            if end == num_tris - 1:
                end += 1  # write remaining mesh (mesh.cpp:80-81)
            elif mat_ids[end] == prev_mat:
                end += 1
                continue
            else:
                prev_mat = mat_ids[end]

            # build the submesh [start, end)
            vertex_cache: dict = {}
            positions, normals, texcoords, triangles = [], [], [], []
            for ti in range(start, end):
                c0, c1, c2 = tri_corners[ti]
                p0 = verts_np[c0[0]]
                p1 = verts_np[c1[0]]
                p2 = verts_np[c2[0]]
                gn = np.cross(p1 - p0, p2 - p0)
                gl = np.linalg.norm(gn)
                gn = (gn / gl).astype(np.float32) if gl > 0 else gn.astype(np.float32)
                tri = []
                for c in (c0, c1, c2):
                    pos = verts_np[c[0]]
                    nrm = norms_np[c[2]] if (c[2] != -1 and len(norms_np)) else gn
                    uv = uvs_np[c[1]] if (c[1] != -1 and len(uvs_np)) else np.zeros(2, np.float32)
                    vkey = (pos[0], pos[1], pos[2], nrm[0], nrm[1], nrm[2], uv[0], uv[1])
                    idx = vertex_cache.get(vkey)
                    if idx is None:
                        idx = len(positions)
                        vertex_cache[vkey] = idx
                        positions.append(pos)
                        normals.append(nrm)
                        texcoords.append(uv)
                    tri.append(idx)
                triangles.append(tri)

            mat_id = mat_ids[start]
            if mat_id == -1:
                material = Material(
                    kd=np.ones(3, np.float32), ks=np.zeros(3, np.float32),
                    shininess=1.0, transparency=1.0)
            else:
                m = material_list[mat_id]
                tex = None
                if m["map_kd"]:
                    tex_path = os.path.join(base_dir, m["map_kd"])
                    if tex_path not in texture_cache:
                        texture_cache[tex_path] = load_image(tex_path)
                    tex = texture_cache[tex_path]
                material = Material(
                    kd=m["kd"].copy(), ks=m["ks"].copy(),
                    shininess=float(m["shininess"]),
                    transparency=float(m["dissolve"]),
                    kd_texture=tex)

            out.append(SubMesh(
                positions=np.asarray(positions, np.float32).reshape(-1, 3),
                normals=np.asarray(normals, np.float32).reshape(-1, 3),
                texcoords=np.asarray(texcoords, np.float32).reshape(-1, 2),
                triangles=np.asarray(triangles, np.uint32).reshape(-1, 3),
                material=material))
            start = end
            end += 1

    if center_and_normalize:
        center_and_scale_to_unit(out)
    return out


def center_and_scale_to_unit(meshes: list[SubMesh]) -> None:
    """centerAndScaleToUnitMesh (mesh.cpp:151-176): translate to the mean of
    all (dedup'd) vertex positions, scale by max distance to that center."""
    all_pos = np.concatenate([m.positions for m in meshes], axis=0)
    center = all_pos.mean(axis=0, dtype=np.float32)
    # the C++ accumulates vec3 in f32; mean in f32 like std::accumulate/N
    center = (all_pos.astype(np.float32).sum(axis=0) / np.float32(len(all_pos))).astype(np.float32)
    max_d = np.float32(np.max(np.linalg.norm(all_pos - center, axis=1)))
    for m in meshes:
        m.positions = ((m.positions - center) / max_d).astype(np.float32)
