"""Reference-parity BVH traversal (device) vs the brute-force sweep.

Accel ON and OFF must agree on hit/miss and hit distance everywhere (the
reference's own guarantee); winners may differ only at exact-t ties, where
both orders are authoritative (SURVEY.md §2.5 #11)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cge_tpu import Camera, SceneType, load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.ops.bvh import build_reference_bvh
from cge_tpu.ops.bvh_traverse import bvh_closest_hit, device_bvh
from cge_tpu.ops.intersect import closest_hit

SCENES = [SceneType.CornellBox, SceneType.Monkey, SceneType.Spheres]


@pytest.mark.parametrize("scene_type", SCENES)
@pytest.mark.parametrize("sah", [False, True])
def test_traversal_matches_brute(scene_type, sah):
    scene = load_scene_prebuilt(scene_type)
    bvh = device_bvh(build_reference_bvh(scene, sah_binning=sah), scene)
    o, d = Camera().generate_rays(pixel_grid(16, 16).reshape(-1, 2))
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)

    brute = closest_hit(scene, o, d, tmax, use_pallas=False)
    hit, t, is_sph, prim = bvh_closest_hit(bvh, o, d, tmax)

    np.testing.assert_array_equal(np.asarray(hit), np.asarray(brute.hit))
    h = np.asarray(hit)
    np.testing.assert_allclose(np.asarray(t)[h], np.asarray(brute.t)[h],
                               rtol=5e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(is_sph)[h],
                                  np.asarray(brute.is_sphere)[h])


def test_traversal_budget():
    """t budget semantics (shadow rays use budget 1.0, light.cpp:60)."""
    scene = load_scene_prebuilt(SceneType.CornellBox)
    bvh = device_bvh(build_reference_bvh(scene), scene)
    o, d = Camera().generate_rays(pixel_grid(8, 8).reshape(-1, 2))
    # default camera sits ~3 from the origin: budget 1 kills every hit
    hit, _, _, _ = bvh_closest_hit(bvh, o, d,
                                   jnp.full(o.shape[0], 1.0, jnp.float32))
    assert not np.asarray(hit).any()
    # dead rays (tmax = -1) never hit
    hit, _, _, _ = bvh_closest_hit(bvh, o, d,
                                   jnp.full(o.shape[0], -1.0, jnp.float32))
    assert not np.asarray(hit).any()
