"""ctypes bindings for the native host runtime (libcge_host.so).

The reference keeps its host hot paths native (prebuilt intersection
library, tinyobjloader); cge_tpu's equivalent is this C++ library for scene
loading and acceleration-structure builds. Pure-Python fallbacks exist for
every entry point (cge_tpu.scene.mesh_io, cge_tpu.ops.bvh), and equivalence
is tested in tests/test_native.py.

The library is built on demand with `make -C cge_tpu/native` (g++). Set
CGE_TPU_NO_NATIVE=1 to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcge_host.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("CGE_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.cge_load_obj.restype = ctypes.c_void_p
    lib.cge_load_obj.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.cge_error.restype = ctypes.c_char_p
    lib.cge_error.argtypes = [ctypes.c_void_p]
    lib.cge_n_submeshes.restype = ctypes.c_int
    lib.cge_n_submeshes.argtypes = [ctypes.c_void_p]
    lib.cge_submesh_counts.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.cge_submesh_data.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.cge_submesh_material.restype = ctypes.c_int
    lib.cge_submesh_material.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_char_p,
        ctypes.c_int]
    lib.cge_release.argtypes = [ctypes.c_void_p]
    lib.cge_build_clusters.restype = ctypes.c_int
    lib.cge_build_clusters.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int]
    lib.cge_build_bvh.restype = ctypes.c_int
    lib.cge_build_bvh.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_obj_native(path: str, center_and_normalize: bool):
    """Native loadMesh. Returns a list of (positions, normals, texcoords,
    triangles, material_dict) or None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = lib.cge_load_obj(path.encode(), int(center_and_normalize))
    if not h:
        return None
    try:
        err = lib.cge_error(h)
        if err:
            raise FileNotFoundError(f"{err.decode()}: {path}")
        out = []
        n = lib.cge_n_submeshes(h)
        for i in range(n):
            nv = ctypes.c_int()
            nt = ctypes.c_int()
            lib.cge_submesh_counts(h, i, ctypes.byref(nv), ctypes.byref(nt))
            pos = np.empty((nv.value, 3), np.float32)
            nrm = np.empty((nv.value, 3), np.float32)
            uv = np.empty((nv.value, 2), np.float32)
            tris = np.empty((nt.value, 3), np.uint32)
            lib.cge_submesh_data(h, i, pos.ctypes.data, nrm.ctypes.data,
                                 uv.ctypes.data, tris.ctypes.data)
            mat8 = np.empty(8, np.float32)
            map_kd = ctypes.create_string_buffer(4096)
            is_default = lib.cge_submesh_material(h, i, mat8.ctypes.data,
                                                  map_kd, 4096)
            mat = dict(kd=mat8[:3].copy(), ks=mat8[3:6].copy(),
                       shininess=float(mat8[6]), dissolve=float(mat8[7]),
                       map_kd=map_kd.value.decode() or None,
                       default=bool(is_default))
            out.append((pos, nrm, uv, tris, mat))
        return out
    finally:
        lib.cge_release(h)


def build_clusters_native(centers: np.ndarray, cluster_size: int):
    """Native largest-extent median cluster builder. centers: [N, 3] f32.
    Returns perm [L, cluster_size] i32 or None."""
    lib = _load()
    if lib is None:
        return None
    centers = np.ascontiguousarray(centers, np.float32)
    n = len(centers)
    cap = (max(1, 2 * (n // cluster_size + 1))) * cluster_size
    perm = np.empty(cap, np.int32)
    nc = lib.cge_build_clusters(centers.ctypes.data, n, cluster_size,
                                perm.ctypes.data, cap)
    if nc < 0:
        return None
    return perm[: nc * cluster_size].reshape(nc, cluster_size).copy()


def build_bvh_native(lo: np.ndarray, hi: np.ndarray, centers: np.ndarray,
                     sah: bool):
    """Native reference-parity BVH build. Returns (node_lo, node_hi,
    node_meta, perm, (levels, leaves, max_per_leaf)) or None."""
    lib = _load()
    if lib is None:
        return None
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    centers = np.ascontiguousarray(centers, np.float32)
    n = len(centers)
    cap = max(1, 2 * n - 1)
    node_lo = np.empty((cap, 3), np.float32)
    node_hi = np.empty((cap, 3), np.float32)
    node_meta = np.empty((cap, 6), np.int32)
    perm = np.empty(n, np.int32)
    stats = np.empty(3, np.int32)
    count = lib.cge_build_bvh(lo.ctypes.data, hi.ctypes.data,
                              centers.ctypes.data, n, int(sah), cap,
                              node_lo.ctypes.data, node_hi.ctypes.data,
                              node_meta.ctypes.data, perm.ctypes.data,
                              stats.ctypes.data)
    if count < 0:
        return None
    return (node_lo[:count].copy(), node_hi[:count].copy(),
            node_meta[:count].copy(), perm,
            (int(stats[0]), int(stats[1]), int(stats[2])))
