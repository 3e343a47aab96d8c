"""Native host runtime (libcge_host.so) vs pure-Python equivalence.

The Python implementations in cge_tpu.scene.mesh_io / cge_tpu.ops.bvh are
the semantic oracles; the C++ library must reproduce them on every shipped
asset."""

import numpy as np
import pytest

from cge_tpu import native as cge_native
from cge_tpu.ops.bvh import build_clusters, build_reference_bvh
from cge_tpu.scene.mesh_io import _load_mesh_python
from cge_tpu.scene.scene import SceneType, load_scene_prebuilt

pytestmark = pytest.mark.skipif(not cge_native.available(),
                                reason="native library unavailable")

DATA = "/root/reference/data"

OBJS = [
    ("triangle.obj", False),
    ("cube.obj", False),
    ("cube-textured.obj", False),
    ("CornellBox-Mirror-Rotated.obj", True),
    ("monkey.obj", True),
    ("teapot.obj", True),
    ("custom.obj", False),
    ("monkey-rotated-quad.obj", True),
]


@pytest.mark.parametrize("name,normalize", OBJS)
def test_native_loader_matches_python(name, normalize):
    path = f"{DATA}/{name}"
    py = _load_mesh_python(path, normalize)
    from cge_tpu.scene.mesh_io import _load_mesh_native
    nat = _load_mesh_native(path, normalize)
    assert nat is not None
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        np.testing.assert_allclose(a.positions, b.positions, rtol=1e-6,
                                   atol=1e-7)
        np.testing.assert_allclose(a.normals, b.normals, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(a.texcoords, b.texcoords, rtol=1e-6)
        np.testing.assert_array_equal(a.triangles, b.triangles)
        np.testing.assert_allclose(a.material.kd, b.material.kd)
        np.testing.assert_allclose(a.material.ks, b.material.ks)
        assert a.material.shininess == pytest.approx(b.material.shininess)
        assert a.material.transparency == pytest.approx(
            b.material.transparency)
        assert (a.material.kd_texture is None) == (b.material.kd_texture is None)


def test_native_loader_missing_file():
    with pytest.raises(FileNotFoundError):
        from cge_tpu.scene.mesh_io import _load_mesh_native
        _load_mesh_native("/nonexistent/foo.obj", False)


@pytest.mark.parametrize("scene_type", [SceneType.CornellBox,
                                        SceneType.Teapot])
def test_native_bvh_stats_match_python(scene_type):
    scene = load_scene_prebuilt(scene_type)
    nat = build_reference_bvh(scene, use_native=True)
    py = build_reference_bvh(scene, use_native=False)
    assert nat.num_levels == py.num_levels
    assert nat.num_leaves == py.num_leaves
    assert nat.max_per_leaf == py.max_per_leaf
    assert len(nat.node_meta) == len(py.node_meta)
    # same leaf range partition (tie order inside ranges may differ)
    def spans(b):
        m = b.node_meta
        return sorted((int(x), int(y)) for x, y in m[m[:, 0] == 1][:, 2:4])
    assert spans(nat) == spans(py)
    # permutation covers the same primitive set
    assert sorted(nat.perm_index.tolist()) == sorted(py.perm_index.tolist())


def test_native_bvh_sah_invariants():
    scene = load_scene_prebuilt(SceneType.Monkey)
    bvh = build_reference_bvh(scene, sah_binning=True, use_native=True)
    P = int(np.asarray(scene.tri_mask).sum())
    assert sorted(bvh.perm_index.tolist()) == list(range(P)) or \
        len(bvh.perm_index) == P
    m = bvh.node_meta
    leaves = m[m[:, 0] == 1]
    spans = sorted((int(b), int(e)) for b, e in leaves[:, 2:4])
    cursor = 0
    for b, e in spans:
        assert b == cursor and e > b
        cursor = e
    assert cursor == P


def test_native_clusters_cover_all():
    scene = load_scene_prebuilt(SceneType.Teapot)
    nat = build_clusters(scene.vertices, scene.tris, scene.tri_mask,
                         use_native=True)
    py = build_clusters(scene.vertices, scene.tris, scene.tri_mask,
                        use_native=False)
    assert nat.shape == py.shape
    want = sorted(np.nonzero(np.asarray(scene.tri_mask))[0].tolist())
    assert sorted(nat[nat >= 0].tolist()) == want
    # per-cluster sizes identical (median splits are size-deterministic)
    np.testing.assert_array_equal((nat >= 0).sum(1), (py >= 0).sum(1))
