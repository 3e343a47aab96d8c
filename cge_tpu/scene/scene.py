"""Scene data model: SoA pytree + the prebuilt scene registry.

The reference keeps a ``Scene{meshes, spheres, lights}`` of nested objects
(/root/reference/src/scene.h:28-33). TPU-first, we flatten everything into
padded, masked, statically-shaped arrays (``SceneArrays``) so the whole scene
is one pytree: jit-traceable, differentiable (gradients flow to vertices,
materials, light parameters, texels), and shardable/replicable with
``jax.sharding``.

``load_scene_prebuilt`` mirrors the hardcoded scene registry at
/root/reference/src/scene.cpp:5-92 (per-scene lights, normalization flags,
material overrides).
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Optional, Sequence, Union

import jax
import numpy as np

from cge_tpu.scene.mesh_io import Material, SubMesh, load_mesh


class SceneType(enum.IntEnum):
    """src/scene.h:15-26."""

    SingleTriangle = 0
    Cube = 1
    CubeTextured = 2
    CornellBox = 3
    CornellBoxParallelogramLight = 4
    Monkey = 5
    Teapot = 6
    Dragon = 7
    Spheres = 8
    Custom = 9


# serialize/deserialize: src/config.cpp:376-431
_SCENE_NAMES = {
    SceneType.SingleTriangle: "single_triangle",
    SceneType.Cube: "cube",
    SceneType.CubeTextured: "cube_textured",
    SceneType.CornellBox: "cornell_box",
    SceneType.CornellBoxParallelogramLight: "cornell_box_parallelogram_light",
    SceneType.Monkey: "monkey",
    SceneType.Teapot: "teapot",
    SceneType.Dragon: "dragon",
    SceneType.Spheres: "spheres",
    SceneType.Custom: "custom",
}


def serialize_scene_type(t: SceneType) -> str:
    return _SCENE_NAMES.get(t, "unknown")


def deserialize_scene_type(name: str) -> Optional[SceneType]:
    lowered = name.lower()
    for t, n in _SCENE_NAMES.items():
        if lowered in (n, n.replace("_", ""), n.replace("_", "-")):
            return t
    return None


# ---------------------------------------------------------------------------
# Host-side light types (src/common.h:37-52)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PointLight:
    position: Sequence[float]
    color: Sequence[float]


@dataclasses.dataclass
class SegmentLight:
    endpoint0: Sequence[float]
    endpoint1: Sequence[float]
    color0: Sequence[float]
    color1: Sequence[float]


@dataclasses.dataclass
class ParallelogramLight:
    v0: Sequence[float]
    edge01: Sequence[float]
    edge02: Sequence[float]
    color0: Sequence[float]
    color1: Sequence[float]
    color2: Sequence[float]
    color3: Sequence[float]


@dataclasses.dataclass
class SphereDef:
    center: Sequence[float]
    radius: float
    material: Material


Light = Union[PointLight, SegmentLight, ParallelogramLight]


# ---------------------------------------------------------------------------
# The device-side scene pytree
# ---------------------------------------------------------------------------

def _f(x):
    return np.asarray(x, np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SceneArrays:
    """Flattened scene. All arrays are padded to static shapes with masks.

    Triangle t's corners are ``vertices[tris[t]]``; its material is row
    ``tri_mat[t]`` of the material table. Sphere materials occupy rows of the
    same table (appended after mesh materials).
    """

    # geometry
    vertices: jax.Array     # [V, 3] f32
    normals: jax.Array      # [V, 3] f32
    uvs: jax.Array          # [V, 2] f32
    tris: jax.Array         # [T, 3] i32
    tri_mat: jax.Array      # [T] i32
    tri_mask: jax.Array     # [T] bool
    # material table
    mat_kd: jax.Array           # [M, 3] f32
    mat_ks: jax.Array           # [M, 3] f32
    mat_shininess: jax.Array    # [M] f32
    mat_transparency: jax.Array  # [M] f32
    mat_tex: jax.Array          # [M] i32 (texture id; -1 = none)
    # texture stack (padded to common H/W)
    textures: jax.Array     # [K, TH, TW, 3] f32
    tex_hw: jax.Array       # [K, 2] i32 (true height, width)
    # spheres
    sph_center: jax.Array   # [S, 3] f32
    sph_radius: jax.Array   # [S] f32
    sph_mat: jax.Array      # [S] i32
    sph_mask: jax.Array     # [S] bool
    # lights
    point_pos: jax.Array    # [LP, 3]
    point_color: jax.Array  # [LP, 3]
    point_mask: jax.Array   # [LP] bool
    seg_p0: jax.Array       # [LS, 3]
    seg_p1: jax.Array
    seg_c0: jax.Array
    seg_c1: jax.Array
    seg_mask: jax.Array     # [LS] bool
    par_v0: jax.Array       # [LQ, 3]
    par_e01: jax.Array
    par_e02: jax.Array
    par_c0: jax.Array
    par_c1: jax.Array
    par_c2: jax.Array
    par_c3: jax.Array
    par_mask: jax.Array     # [LQ] bool
    # acceleration: triangle ids grouped into spatially-coherent clusters
    # (cge_tpu.ops.bvh.build_clusters); [L, C] i32, -1 = pad. Consumed by the
    # Pallas cluster-sweep kernel when Features.enable_accel_structure is on.
    cluster_perm: jax.Array = None
    # static metadata (not traced): True iff every material is opaque —
    # picks the bounce-loop unroll depth at trace time.
    all_opaque: bool = dataclasses.field(
        default=True, metadata=dict(static=True))
    # True iff every material's ks == 0: mirror children are always the
    # zero sentinel (shading.cpp:42-47), so the TRANS+REC tree collapses
    # to a single-child chain (no 2^depth fan-out) — trace shape only,
    # radiance is bitwise identical (the dropped branch carries weight 0).
    all_diffuse: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    @property
    def num_tris(self) -> int:
        return self.tris.shape[0]

    @property
    def num_spheres(self) -> int:
        return self.sph_center.shape[0]


def build_scene_arrays(
    meshes: Sequence[SubMesh],
    spheres: Sequence[SphereDef] = (),
    lights: Sequence[Light] = (),
    pad_tris_to: int = 8,
) -> SceneArrays:
    """Flatten host-side meshes/spheres/lights into a SceneArrays pytree."""
    # --- concatenate mesh geometry, offsetting vertex indices
    positions, normals, uvs, tris, tri_mat = [], [], [], [], []
    mat_kd, mat_ks, mat_sh, mat_tr, mat_tex = [], [], [], [], []
    textures: list[np.ndarray] = []
    tex_hw: list = []
    voff = 0
    for m in meshes:
        positions.append(m.positions)
        normals.append(m.normals)
        uvs.append(m.texcoords)
        tris.append(m.triangles.astype(np.int64) + voff)
        voff += len(m.positions)
        mid = len(mat_kd)
        tri_mat.append(np.full(len(m.triangles), mid, np.int64))
        mat_kd.append(_f(m.material.kd))
        mat_ks.append(_f(m.material.ks))
        mat_sh.append(np.float32(m.material.shininess))
        mat_tr.append(np.float32(m.material.transparency))
        if m.material.kd_texture is not None:
            tex = m.material.kd_texture
            mat_tex.append(len(textures))
            textures.append(tex.pixels)
            tex_hw.append((tex.height, tex.width))
        else:
            mat_tex.append(-1)
    for s in spheres:
        mid = len(mat_kd)
        mat_kd.append(_f(s.material.kd))
        mat_ks.append(_f(s.material.ks))
        mat_sh.append(np.float32(s.material.shininess))
        mat_tr.append(np.float32(s.material.transparency))
        mat_tex.append(-1)

    def cat(parts, width, dtype=np.float32):
        if parts:
            return np.concatenate([np.asarray(p, dtype).reshape(-1, width) for p in parts], axis=0)
        return np.zeros((0, width), dtype)

    V = cat(positions, 3)
    N = cat(normals, 3)
    UV = cat(uvs, 2)
    T = cat(tris, 3, np.int64).astype(np.int32)
    TM = (np.concatenate(tri_mat) if tri_mat else np.zeros(0, np.int64)).astype(np.int32)

    # pad triangles to a multiple (TPU lane-friendliness) with mask
    nt = len(T)
    padded_nt = max(pad_tris_to, -(-max(nt, 1) // pad_tris_to) * pad_tris_to)
    tri_mask = np.zeros(padded_nt, bool)
    tri_mask[:nt] = True
    T = np.concatenate([T, np.zeros((padded_nt - nt, 3), np.int32)])
    TM = np.concatenate([TM, np.zeros(padded_nt - nt, np.int32)])
    if len(V) == 0:
        V = np.zeros((1, 3), np.float32)
        N = np.zeros((1, 3), np.float32)
        UV = np.zeros((1, 2), np.float32)

    # material table (>=1 row)
    M = max(1, len(mat_kd))
    kd = np.zeros((M, 3), np.float32)
    ks = np.zeros((M, 3), np.float32)
    sh = np.ones(M, np.float32)
    tr = np.ones(M, np.float32)
    tx = np.full(M, -1, np.int32)
    for i in range(len(mat_kd)):
        kd[i], ks[i], sh[i], tr[i], tx[i] = mat_kd[i], mat_ks[i], mat_sh[i], mat_tr[i], mat_tex[i]

    # texture stack
    if textures:
        th = max(t.shape[0] for t in textures)
        tw = max(t.shape[1] for t in textures)
        stack = np.zeros((len(textures), th, tw, 3), np.float32)
        hw = np.zeros((len(textures), 2), np.int32)
        for i, t in enumerate(textures):
            stack[i, : t.shape[0], : t.shape[1]] = t
            hw[i] = (t.shape[0], t.shape[1])
    else:
        stack = np.zeros((1, 1, 1, 3), np.float32)
        hw = np.ones((1, 2), np.int32)

    # spheres
    S = max(1, len(spheres))
    sc = np.zeros((S, 3), np.float32)
    sr = np.ones(S, np.float32)
    sm = np.zeros(S, np.int32)
    smask = np.zeros(S, bool)
    for i, s in enumerate(spheres):
        sc[i] = _f(s.center)
        sr[i] = np.float32(s.radius)
        sm[i] = len(mat_kd) - len(spheres) + i
        smask[i] = True

    # lights
    pls = [l for l in lights if isinstance(l, PointLight)]
    sls = [l for l in lights if isinstance(l, SegmentLight)]
    qls = [l for l in lights if isinstance(l, ParallelogramLight)]

    def pack(items, getters, n_min=1):
        n = max(n_min, len(items))
        arrs = [np.zeros((n, 3), np.float32) for _ in getters]
        mask = np.zeros(n, bool)
        for i, it in enumerate(items):
            for a, g in zip(arrs, getters):
                a[i] = _f(g(it))
            mask[i] = True
        return arrs, mask

    (pp, pc), pmask = pack(pls, [lambda l: l.position, lambda l: l.color])
    (s0, s1, sc0, sc1), smask_l = pack(
        sls, [lambda l: l.endpoint0, lambda l: l.endpoint1,
              lambda l: l.color0, lambda l: l.color1])
    (q0, qe1, qe2, qc0, qc1, qc2, qc3), qmask = pack(
        qls, [lambda l: l.v0, lambda l: l.edge01, lambda l: l.edge02,
              lambda l: l.color0, lambda l: l.color1, lambda l: l.color2,
              lambda l: l.color3])

    import jax.numpy as jnp

    from cge_tpu.ops.bvh import build_clusters

    j = jnp.asarray
    return SceneArrays(
        cluster_perm=j(build_clusters(V, T, tri_mask)),
        vertices=j(V), normals=j(N), uvs=j(UV), tris=j(T), tri_mat=j(TM),
        tri_mask=j(tri_mask),
        mat_kd=j(kd), mat_ks=j(ks), mat_shininess=j(sh),
        mat_transparency=j(tr), mat_tex=j(tx),
        textures=j(stack), tex_hw=j(hw),
        sph_center=j(sc), sph_radius=j(sr), sph_mat=j(sm), sph_mask=j(smask),
        point_pos=j(pp), point_color=j(pc), point_mask=j(pmask),
        seg_p0=j(s0), seg_p1=j(s1), seg_c0=j(sc0), seg_c1=j(sc1),
        seg_mask=j(smask_l),
        par_v0=j(q0), par_e01=j(qe1), par_e02=j(qe2),
        par_c0=j(qc0), par_c1=j(qc1), par_c2=j(qc2), par_c3=j(qc3),
        par_mask=j(qmask),
        all_opaque=bool(np.all(tr == 1.0)),
        all_diffuse=bool(np.all(np.asarray(ks) == 0.0)),
    )


DEFAULT_DATA_DIR = "/root/reference/data"


def load_scene_prebuilt(scene_type: SceneType, data_dir: str = DEFAULT_DATA_DIR) -> SceneArrays:
    """The hardcoded scene registry (src/scene.cpp:5-92)."""
    meshes, spheres, lights = prebuilt_scene_parts(scene_type, data_dir)
    return build_scene_arrays(meshes, spheres, lights)


def prebuilt_scene_parts(scene_type: SceneType,
                         data_dir: str = DEFAULT_DATA_DIR):
    """The registry's host-side parts (meshes, spheres, lights) — exposed so
    the interactive app can seed its editable light list (the reference's
    light editor starts from the scene's built-in lights, main.cpp:275-368).
    """
    meshes: list[SubMesh] = []
    spheres: list[SphereDef] = []
    lights: list[Light] = []
    t = SceneType(scene_type)
    if t == SceneType.SingleTriangle:
        meshes = load_mesh(os.path.join(data_dir, "triangle.obj"))
        meshes[0].material.kd = np.ones(3, np.float32)  # scene.cpp:13
        lights = [PointLight((-1, 1, -1), (1, 1, 1))]
    elif t == SceneType.Cube:
        meshes = load_mesh(os.path.join(data_dir, "cube.obj"))
        lights = [SegmentLight((1.5, 0.5, -0.6), (-1, 0.5, -0.5),
                               (0.9, 0.2, 0.1), (0.2, 1, 0.3))]
    elif t == SceneType.CubeTextured:
        meshes = load_mesh(os.path.join(data_dir, "cube-textured.obj"))
        lights = [PointLight((-1.0, 1.5, -1.0), (1, 1, 1))]
    elif t == SceneType.CornellBox:
        meshes = load_mesh(os.path.join(data_dir, "CornellBox-Mirror-Rotated.obj"), True)
        lights = [PointLight((0, 0.58, 0), (1, 1, 1))]
    elif t == SceneType.CornellBoxParallelogramLight:
        meshes = load_mesh(os.path.join(data_dir, "CornellBox-Mirror-Rotated.obj"), True)
        lights = [ParallelogramLight((-0.2, 0.5, 0), (0.4, 0, 0), (0, 0, 0.4),
                                     (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 1, 1))]
    elif t == SceneType.Monkey:
        meshes = load_mesh(os.path.join(data_dir, "monkey.obj"), True)
        lights = [PointLight((-1, 1, -1), (1, 1, 1)),
                  PointLight((1, -1, -1), (1, 1, 1))]
    elif t == SceneType.Teapot:
        meshes = load_mesh(os.path.join(data_dir, "teapot.obj"), True)
        lights = [PointLight((-1, 1, -1), (1, 1, 1))]
    elif t == SceneType.Dragon:
        meshes = load_mesh(os.path.join(data_dir, "dragon.obj"), True)
        lights = [PointLight((-1, 1, -1), (1, 1, 1))]
    elif t == SceneType.Spheres:
        spheres = [
            SphereDef((3.0, -2.0, 10.2), 1.0, Material(kd=_f((0.8, 0.2, 0.2)))),
            SphereDef((-2.0, 2.0, 4.0), 2.0, Material(kd=_f((0.6, 0.8, 0.2)))),
            SphereDef((0.0, 0.0, 6.0), 0.75, Material(kd=_f((0.2, 0.2, 0.8)))),
        ]
        lights = [PointLight((3, 0, 3), (15, 15, 15))]
    elif t == SceneType.Custom:
        meshes = load_mesh(os.path.join(data_dir, "custom.obj"))
        lights = [PointLight((-1, 1, -1), (1, 1, 1))]
    return meshes, spheres, lights


def replace_lights(scene: SceneArrays, lights: Sequence[Light],
                   min_slots: int = 8) -> SceneArrays:
    """Rebuild only the light arrays — the interactive light editor's
    mutation path (add/remove/move lights, main.cpp:275-368). Slots are
    padded to min_slots so repeated edits below that capacity reuse one
    compiled render executable (static shapes)."""
    import jax.numpy as jnp

    pls = [l for l in lights if isinstance(l, PointLight)]
    sls = [l for l in lights if isinstance(l, SegmentLight)]
    qls = [l for l in lights if isinstance(l, ParallelogramLight)]

    def pack(items, getters):
        n = max(min_slots, len(items))
        arrs = [np.zeros((n, 3), np.float32) for _ in getters]
        mask = np.zeros(n, bool)
        for i, it in enumerate(items):
            for a, g in zip(arrs, getters):
                a[i] = _f(g(it))
            mask[i] = True
        return arrs, mask

    (pp, pc), pmask = pack(pls, [lambda l: l.position, lambda l: l.color])
    (s0, s1, sc0, sc1), smask = pack(
        sls, [lambda l: l.endpoint0, lambda l: l.endpoint1,
              lambda l: l.color0, lambda l: l.color1])
    (q0, qe1, qe2, qc0, qc1, qc2, qc3), qmask = pack(
        qls, [lambda l: l.v0, lambda l: l.edge01, lambda l: l.edge02,
              lambda l: l.color0, lambda l: l.color1, lambda l: l.color2,
              lambda l: l.color3])
    j = jnp.asarray
    return dataclasses.replace(
        scene,
        point_pos=j(pp), point_color=j(pc), point_mask=j(pmask),
        seg_p0=j(s0), seg_p1=j(s1), seg_c0=j(sc0), seg_c1=j(sc1),
        seg_mask=j(smask),
        par_v0=j(q0), par_e01=j(qe1), par_e02=j(qe2),
        par_c0=j(qc0), par_c1=j(qc1), par_c2=j(qc2), par_c3=j(qc3),
        par_mask=j(qmask))


def load_scene_from_file(path: str, lights: Sequence[Light]) -> SceneArrays:
    """loadSceneFromFile (src/scene.cpp:94-103)."""
    return build_scene_arrays(load_mesh(path), (), lights)
