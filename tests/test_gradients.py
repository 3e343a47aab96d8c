"""Finite-difference checks of the differentiable renderer.

Pixel gradients w.r.t. vertex positions, material kd/ks/shininess, light
position/color, sphere geometry, and texels (BASELINE.md north star). The
hit *selection* is stop-gradient, so we perturb within the smooth region
(no visibility/silhouette crossings at these magnitudes) and compare
reverse-mode AD against central differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cge_tpu import Camera, Features, RenderParams, SceneType, load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.diff.gradients import render_loss, scene_params

FEATS = Features(enable_shading=True, enable_hard_shadow=True,
                 enable_recursive=True)


@pytest.fixture(scope="module")
def setup():
    scene = load_scene_prebuilt(SceneType.CornellBox)
    grid = pixel_grid(12, 12).reshape(-1, 2)
    o, d = Camera().generate_rays(grid)
    key = jax.random.PRNGKey(0)
    # target: a slightly perturbed render so gradients are non-trivial
    params = scene_params(scene)
    target = jnp.full((o.shape[0], 3), 0.25, jnp.float32)

    def loss_of(p):
        return render_loss(p, scene, o, d, target, FEATS, RenderParams(), key)

    val, grads = jax.value_and_grad(loss_of)(params)
    # NaN guard: the pow-quirk pixels produce NaN radiance; they are constant
    # w.r.t. parameters in value but poison grads — this scene/view has none
    assert np.isfinite(float(val))
    return params, loss_of, grads


def _fd_check(params, loss_of, grads, field, indices, eps, rtol=0.06,
              min_mag=1e-9):
    g = np.asarray(grads[field])
    checked = 0
    for idx in indices:
        if not np.isfinite(g[idx]) or abs(g[idx]) < min_mag:
            continue
        p_plus = dict(params)
        p_minus = dict(params)
        delta = jnp.zeros_like(params[field]).at[idx].set(eps)
        p_plus[field] = params[field] + delta
        p_minus[field] = params[field] - delta
        fd = (float(loss_of(p_plus)) - float(loss_of(p_minus))) / (2 * eps)
        ad = float(g[idx])
        assert np.isclose(ad, fd, rtol=rtol, atol=1e-7), (
            f"{field}{idx}: ad={ad:.6e} fd={fd:.6e}")
        checked += 1
    assert checked > 0, f"no checkable gradient entries for {field}"


def test_grad_kd(setup):
    params, loss_of, grads = setup
    _fd_check(params, loss_of, grads, "mat_kd",
              [(i, c) for i in range(4) for c in range(3)], 1e-3)


def test_grad_light(setup):
    params, loss_of, grads = setup
    _fd_check(params, loss_of, grads, "point_pos",
              [(0, c) for c in range(3)], 1e-4)
    _fd_check(params, loss_of, grads, "point_color",
              [(0, c) for c in range(3)], 1e-3)


def test_grad_vertices(setup):
    params, loss_of, grads = setup
    g = np.asarray(grads["vertices"])
    order = np.argsort(-np.abs(g).max(axis=1))
    idxs = [(int(i), int(np.argmax(np.abs(g[i])))) for i in order[:5]]
    _fd_check(params, loss_of, grads, "vertices", idxs, 1e-5, rtol=0.15)


@pytest.fixture(scope="module")
def specular_setup():
    """A scene where the specular quirk gate fires with a *positive* pow
    base (finite): triangle normal facing away from the camera, light behind
    the triangle — the only configuration where the reference's specular
    term is non-NaN and non-zero (shading.cpp:29-31)."""
    from cge_tpu.scene.mesh_io import Material, SubMesh
    from cge_tpu.scene.scene import PointLight, build_scene_arrays

    tri = SubMesh(
        positions=np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32),
        normals=np.repeat(np.array([[0, 0, 1]], np.float32), 3, 0),
        texcoords=np.zeros((3, 2), np.float32),
        triangles=np.array([[0, 1, 2]], np.uint32),
        material=Material(kd=np.array([0.4, 0.4, 0.4], np.float32),
                          ks=np.array([0.6, 0.5, 0.4], np.float32),
                          shininess=7.0))
    scene = build_scene_arrays([tri], (), [PointLight((0.3, 0.2, 2.0), (1, 1, 1))])
    # camera at z=-3 looking +z
    cam = Camera(rotation=(0.0, 0.0, 0.0))  # at (0,0,-3) looking +z
    grid = pixel_grid(8, 8).reshape(-1, 2)
    o, d = cam.generate_rays(grid)
    key = jax.random.PRNGKey(0)
    params = scene_params(scene)
    target = jnp.full((o.shape[0], 3), 0.1, jnp.float32)
    feats = Features(enable_shading=True)

    def loss_of(p):
        return render_loss(p, scene, o, d, target, feats, RenderParams(), key)

    val, grads = jax.value_and_grad(loss_of)(params)
    assert np.isfinite(float(val))
    return params, loss_of, grads


def test_grad_ks(specular_setup):
    params, loss_of, grads = specular_setup
    g = np.asarray(grads["mat_ks"])
    assert np.isfinite(g).all()
    _fd_check(params, loss_of, grads, "mat_ks",
              [(0, c) for c in range(3)], 1e-3)


def test_grad_shininess(specular_setup):
    params, loss_of, grads = specular_setup
    g = np.asarray(grads["mat_shininess"])
    assert np.isfinite(g).all()
    _fd_check(params, loss_of, grads, "mat_shininess", [0], 1e-3, rtol=0.1)


def test_grad_texture():
    scene = load_scene_prebuilt(SceneType.CubeTextured)
    feats = Features(enable_shading=True, enable_texture_mapping=True)
    grid = pixel_grid(12, 12).reshape(-1, 2)
    o, d = Camera().generate_rays(grid)
    key = jax.random.PRNGKey(0)
    params = scene_params(scene)
    target = jnp.full((o.shape[0], 3), 0.25, jnp.float32)

    def loss_of(p):
        return render_loss(p, scene, o, d, target, feats, RenderParams(), key)

    grads = jax.grad(loss_of)(params)
    g = np.asarray(grads["textures"])
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0, "no gradient reached the texels"
    # spot-check the strongest texel
    flat = np.abs(g).reshape(-1)
    i = int(np.argmax(flat))
    idx = np.unravel_index(i, g.shape)
    eps = 1e-3
    delta = jnp.zeros_like(params["textures"]).at[idx].set(eps)
    fd = (float(loss_of({**params, "textures": params["textures"] + delta}))
          - float(loss_of({**params, "textures": params["textures"] - delta}))
          ) / (2 * eps)
    assert np.isclose(float(g[idx]), fd, rtol=0.06, atol=1e-8)
