"""Golden tests: cge_tpu intersection ops vs the reference's prebuilt native
intersection library.

tests/golden/golden_intersect.bin is produced by tools/golden_intersect.cpp,
which links the authoritative binary /root/reference/prebuilt/
libIntersect_linux_x64.a and dumps (input, output) pairs for 4096 randomized
cases per kernel. Here we replay the inputs through the JAX ops and demand
agreement (exact hit/miss decisions up to f32 ulp noise at decision
boundaries; t values to tight tolerance).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cge_tpu.ops import intersect as I

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_intersect.bin")
N = 4096


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing (run tools/golden_intersect.cpp)")
    data = np.fromfile(GOLDEN, dtype=np.float32)
    off = 0

    def take(n_rec, width):
        nonlocal off
        out = data[off: off + n_rec * width].reshape(n_rec, width)
        off += n_rec * width
        return out

    tri = take(N, 19)
    sph = take(N, 16)
    box = take(N, 16)
    pln = take(N, 26)
    assert off == data.size
    return dict(tri=tri, sph=sph, box=box, pln=pln)


def _agree(mask_ok, frac=0.999):
    """Decision-boundary f32 noise tolerance: demand >= 99.9% agreement."""
    assert mask_ok.mean() >= frac, f"agreement {mask_ok.mean():.5f}"


def _paired(fn, n, chunk=512):
    """Evaluate a [R, T]-shaped batched op on paired cases (ray i vs prim i)
    by chunking and taking block diagonals (avoids an N x N blowup)."""
    outs = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        res = fn(s, e)
        if isinstance(res, tuple):
            outs.append(tuple(np.asarray(r)[np.arange(e - s), np.arange(e - s)]
                              for r in res))
        else:
            outs.append(np.asarray(res)[np.arange(e - s), np.arange(e - s)])
    if isinstance(outs[0], tuple):
        return tuple(np.concatenate([o[i] for o in outs]) for i in range(len(outs[0])))
    return np.concatenate(outs)


def test_triangle_golden(golden):
    g = golden["tri"]
    v0, v1, v2 = g[:, 0:3], g[:, 3:6], g[:, 6:9]
    o, tin, d = g[:, 9:12], g[:, 12], g[:, 14:17]
    hit_ref, t_ref = g[:, 17] > 0, g[:, 18]
    t_mine = _paired(lambda s, e: I.intersect_triangles_t(
        jnp.asarray(o[s:e]), jnp.asarray(d[s:e]), jnp.asarray(tin[s:e]),
        jnp.asarray(v0[s:e]), jnp.asarray(v1[s:e]), jnp.asarray(v2[s:e])), N)
    hit_mine = np.isfinite(t_mine)
    _agree(hit_mine == hit_ref)
    both = hit_mine & hit_ref
    np.testing.assert_allclose(t_mine[both], t_ref[both], rtol=2e-5, atol=2e-6)


def test_sphere_golden(golden):
    g = golden["sph"]
    c, r = g[:, 0:3], g[:, 3]
    o, d, tin = g[:, 4:7], g[:, 7:10], g[:, 10]
    hit_ref, t_ref = g[:, 11] > 0, g[:, 12]
    n_ref = g[:, 13:16]
    t_mine = _paired(lambda s, e: I.intersect_spheres_t(
        jnp.asarray(o[s:e]), jnp.asarray(d[s:e]), jnp.asarray(tin[s:e]),
        jnp.asarray(c[s:e]), jnp.asarray(r[s:e])), N)
    hit_mine = np.isfinite(t_mine)
    _agree(hit_mine == hit_ref)
    both = hit_mine & hit_ref
    np.testing.assert_allclose(t_mine[both], t_ref[both], rtol=2e-4, atol=2e-5)
    # reference fills hitInfo.normal = normalize(p - center)
    p = o[both] + t_mine[both, None] * d[both]
    n_mine = p - c[both]
    n_mine /= np.linalg.norm(n_mine, axis=-1, keepdims=True)
    np.testing.assert_allclose(n_mine, n_ref[both], rtol=1e-3, atol=2e-3)


def test_aabb_golden(golden):
    g = golden["box"]
    lo, hi = g[:, 0:3], g[:, 3:6]
    o, tin = g[:, 6:9], g[:, 10]
    d = g[:, 11:14]
    hit_ref, t_ref = g[:, 14] > 0, g[:, 15]
    hit_mine, t_mine = _paired(lambda s, e: I.intersect_aabb(
        jnp.asarray(o[s:e]), jnp.asarray(d[s:e]), jnp.asarray(tin[s:e]),
        jnp.asarray(lo[s:e]), jnp.asarray(hi[s:e])), N)
    _agree(hit_mine == hit_ref)
    both = (hit_mine > 0) & hit_ref
    np.testing.assert_allclose(t_mine[both], t_ref[both], rtol=2e-5, atol=2e-6)


def test_plane_and_point_in_triangle_golden(golden):
    g = golden["pln"]
    v0, v1, v2, p = g[:, 0:3], g[:, 3:6], g[:, 6:9], g[:, 9:12]
    D_ref, n_ref = g[:, 12], g[:, 13:16]
    inside_ref = g[:, 16] > 0
    o, d, tin = g[:, 17:20], g[:, 20:23], g[:, 23]
    phit_ref, t_ref = g[:, 24] > 0, g[:, 25]

    n_mine, D_mine = I.triangle_plane(
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
    np.testing.assert_allclose(np.asarray(n_mine), n_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(D_mine), D_ref, rtol=1e-4, atol=1e-5)

    inside_mine = np.asarray(I.point_in_triangle(
        jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
        jnp.asarray(n_ref), jnp.asarray(p)))
    _agree(inside_mine == inside_ref, 0.995)

    t_mine = np.asarray(I.intersect_ray_plane_t(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(n_ref), jnp.asarray(D_ref)))
    phit_mine = (t_mine >= 0) & (t_mine <= tin)
    _agree(phit_mine == phit_ref)
    both = phit_mine & phit_ref
    np.testing.assert_allclose(t_mine[both], t_ref[both], rtol=2e-5, atol=2e-6)
