"""End-to-end inverse rendering: recover scene parameters from pixels.

The BASELINE.md north star says pixel gradients must *work*, not just
FD-match: this test runs an actual optimization loop — render a target
with the true parameters, perturb them, and descend the pixel MSE with
optax Adam through the full bounce-scan renderer. Complements the
per-stage finite-difference checks in test_gradients.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cge_tpu import Camera, Features, RenderParams, SceneType, load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.diff.gradients import render_loss, scene_params, with_params
from cge_tpu.render.wavefront import trace

FEATS = Features(enable_shading=True, enable_hard_shadow=True,
                 enable_recursive=True)
RP = RenderParams()


def _rays(n=16):
    grid = pixel_grid(n, n).reshape(-1, 2)
    return Camera().generate_rays(grid)


def _optimize(scene, true_params, start_params, fields, steps=60, lr=0.02,
              feats=FEATS):
    """Adam on a subset of differentiable leaves, MSE against the render
    of the true parameters."""
    o, d = _rays()
    key = jax.random.PRNGKey(3)
    target = jnp.nan_to_num(
        trace(with_params(scene, true_params), o, d, feats, RP, key))

    opt = optax.adam(lr)

    def loss_fn(p_sub):
        p = dict(true_params)
        p.update(p_sub)
        return render_loss(p, scene, o, d, target, feats, RP, key)

    p_sub = {k: start_params[k] for k in fields}
    state = opt.init(p_sub)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    loss0 = float(loss_fn(p_sub))
    for _ in range(steps):
        p_sub, state, loss = step(p_sub, state)
    return loss0, float(loss), p_sub


@pytest.fixture(scope="module")
def cornell():
    return load_scene_prebuilt(SceneType.CornellBox)


def test_recover_kd(cornell):
    true_p = scene_params(cornell)
    start = dict(true_p)
    # perturb every material's diffuse color (clip keeps radiance valid)
    start["mat_kd"] = jnp.clip(true_p["mat_kd"] * 0.45 + 0.2, 0.0, 1.0)
    loss0, loss1, rec = _optimize(cornell, true_p, start, ["mat_kd"])
    assert loss1 < loss0 * 0.05
    # the visible materials' kd converge to the truth
    err = np.abs(np.asarray(rec["mat_kd"] - true_p["mat_kd"]))
    assert np.median(err) < 0.06


def test_recover_light_position(cornell):
    """Light position is only piecewise-smooth under hard shadows (the
    binary visibility is stop-gradient — the documented boundary), so the
    end-to-end recovery uses the smooth shading-only feature set."""
    true_p = scene_params(cornell)
    start = dict(true_p)
    start["point_pos"] = true_p["point_pos"] + jnp.asarray(
        [[0.25, -0.2, 0.15]], jnp.float32)
    loss0, loss1, rec = _optimize(
        cornell, true_p, start, ["point_pos"], steps=120, lr=0.02,
        feats=Features(enable_shading=True, enable_recursive=True))
    assert loss1 < loss0 * 0.1
    err = float(jnp.abs(rec["point_pos"] - true_p["point_pos"]).max())
    assert err < 0.08


def test_recover_light_color(cornell):
    true_p = scene_params(cornell)
    start = dict(true_p)
    start["point_color"] = true_p["point_color"] * 0.3
    loss0, loss1, rec = _optimize(cornell, true_p, start, ["point_color"],
                                  steps=60, lr=0.05)
    assert loss1 < loss0 * 0.02
    err = float(jnp.abs(rec["point_color"] - true_p["point_color"]).max())
    assert err < 0.05
