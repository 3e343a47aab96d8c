"""Statistical parity for the stochastic features vs the live oracle.

Soft shadows, MSAA and DoF are irreproducible in the reference (unseeded
rand()/mt19937, SURVEY.md §2.5 #14), so pixel-exact goldens are impossible;
instead we render the same config through the real reference renderer
(tools/oracle) and require the *estimates* to agree: both sides compute
Monte-Carlo means of the same integrand, so per-pixel differences must be
sampling noise, not bias."""

import os
import subprocess

import numpy as np
import pytest

from cge_tpu import (Camera, Features, RenderParams, SceneType,
                     load_scene_prebuilt, render_image)

ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                      "oracle")

pytestmark = pytest.mark.skipif(not os.path.exists(ORACLE),
                                reason="oracle binary missing")


def run_oracle(scene_name, res, fcsv, tmp_path):
    out = tmp_path / "oracle.raw"
    subprocess.run(
        [ORACLE, scene_name, str(res), str(res), fcsv, "50", "3",
         "0,0,0", "20,20,0", str(out)],
        check=True, timeout=600, capture_output=True)
    raw = np.fromfile(out, dtype=np.float32)
    w, h = raw[:2].view(np.int32)
    return raw[2:].reshape(int(h), int(w), 3)


def _compare(ours, ref, mean_tol, pix_tol, frac=0.95):
    ours = np.nan_to_num(ours)
    ref = np.nan_to_num(ref)
    mean_err = abs(float(ours.mean()) - float(ref.mean()))
    assert mean_err < mean_tol, f"mean err {mean_err:.4f}"
    close = (np.abs(ours - ref) < pix_tol).all(axis=-1).mean()
    assert close > frac, f"only {close:.2%} pixels within {pix_tol}"


def test_soft_shadows_parallelogram(tmp_path):
    """25-sample stratified area-light estimates must agree pixelwise up to
    Monte-Carlo noise (light.cpp:139-157 vs cge_tpu.render.lights)."""
    res = 32
    ref = run_oracle("cornell_box_parallelogram_light", res,
                     "shading,soft_shadow", tmp_path)
    scene = load_scene_prebuilt(SceneType.CornellBoxParallelogramLight)
    feats = Features(enable_shading=True, enable_soft_shadow=True)
    ours = np.asarray(render_image(scene, Camera(), feats, RenderParams(),
                                   res, res))
    _compare(ours, ref, mean_tol=0.01, pix_tol=0.15)


def test_soft_shadows_segment(tmp_path):
    res = 32
    ref = run_oracle("cube", res, "shading,soft_shadow", tmp_path)
    scene = load_scene_prebuilt(SceneType.Cube)
    feats = Features(enable_shading=True, enable_soft_shadow=True)
    ours = np.asarray(render_image(scene, Camera(), feats, RenderParams(),
                                   res, res))
    _compare(ours, ref, mean_tol=0.01, pix_tol=0.15)


def test_msaa(tmp_path):
    """3x3 jittered sub-pixel grid (render.cpp:211-227): the estimates
    differ only by jitter noise at geometry edges."""
    res = 32
    ref = run_oracle("cornell_box", res, "shading,msaa", tmp_path)
    scene = load_scene_prebuilt(SceneType.CornellBox)
    feats = Features(enable_shading=True,
                     enable_multiple_rays_per_pixel=True)
    ours = np.asarray(render_image(scene, Camera(), feats, RenderParams(),
                                   res, res))
    _compare(ours, ref, mean_tol=0.01, pix_tol=0.25)


def test_depth_of_field(tmp_path):
    """Disk-sampled origins toward the focal plane (render.cpp:243-271)."""
    res = 24
    ref = run_oracle("cornell_box", res, "shading,dof", tmp_path)
    scene = load_scene_prebuilt(SceneType.CornellBox)
    feats = Features(enable_shading=True, enable_depth_of_field=True)
    ours = np.asarray(render_image(scene, Camera(), feats, RenderParams(),
                                   res, res))
    _compare(ours, ref, mean_tol=0.015, pix_tol=0.25, frac=0.9)


def test_glossy_cornell_mirror(tmp_path):
    """Glossy cone reflections (render.cpp:56-99) on the cornell mirror box
    (tallBox ks=0.95, Ns=10): the reference averages rays_per_reflection=40
    cone samples recursively; our wavefront fans out 40 samples at bounce 1
    and continues single-sample chains (cge_tpu.render.wavefront.
    trace_glossy) — an unbiased estimator of the same integrand, so the
    Monte-Carlo means must agree (this is the estimator-bias trap the r01
    review flagged: a weighting bug would show up as a mean shift on the
    mirror pixels)."""
    res = 32
    ref = run_oracle("cornell_box", res, "shading,recursive,glossy",
                     tmp_path)
    scene = load_scene_prebuilt(SceneType.CornellBox)
    feats = Features(enable_shading=True, enable_recursive=True,
                     enable_glossy_reflection=True)
    ours = np.asarray(render_image(scene, Camera(), feats, RenderParams(),
                                   res, res))
    # deeper-bounce chains have higher per-pixel variance than the
    # reference's full fan-out, so the pixel tolerance is looser; the mean
    # must still match tightly (bias check)
    _compare(ours, ref, mean_tol=0.012, pix_tol=0.3, frac=0.9)


def test_glossy_mean_on_mirror_pixels(tmp_path):
    """Bias check restricted to pixels whose primary hit IS the mirror:
    compares the mirror-region mean (where glossy contributes ~all the
    radiance) rather than letting diffuse walls mask a biased estimator."""
    res = 48
    ref = run_oracle("cornell_box", res, "shading,recursive,glossy",
                     tmp_path)
    scene = load_scene_prebuilt(SceneType.CornellBox)
    feats = Features(enable_shading=True, enable_recursive=True,
                     enable_glossy_reflection=True)
    ours = np.asarray(render_image(scene, Camera(), feats, RenderParams(),
                                   res, res))
    # mirror mask: pixels where glossy-off and glossy-on differ materially
    base = np.asarray(render_image(scene, Camera(),
                                   Features(enable_shading=True),
                                   RenderParams(), res, res))
    mask = (np.abs(np.nan_to_num(ref) - np.nan_to_num(base)).max(axis=-1)
            > 0.02)
    assert mask.sum() > 20, "mirror region unexpectedly small"
    m_ref = float(np.nan_to_num(ref)[mask].mean())
    m_ours = float(np.nan_to_num(ours)[mask].mean())
    assert abs(m_ours - m_ref) < 0.04, (
        f"glossy estimator bias on mirror pixels: ours {m_ours:.4f} "
        f"vs reference {m_ref:.4f}")


@pytest.mark.slow
def test_glossy_mirror_confidence_interval(tmp_path):
    """Proper two-sample bound on the glossy estimator's mirror-region bias
    (VERDICT r3 weak #8). The reference's rand() makes each oracle run an
    independent replicate; our threefry seeds do the same. Both sides
    estimate the same integrand (render.cpp:56-99), so the difference of
    mirror-region means must lie within a z-bound built from the measured
    between-replicate spreads — not an arbitrary fixed tolerance. The
    chain approximation (wavefront.trace_glossy: 40-way fan-out at bounce
    1, single-sample chains below) is unbiased for the same expectation;
    a weighting error of even a few percent fails this bound."""
    res = 48
    R, S = 5, 4
    scene = load_scene_prebuilt(SceneType.CornellBox)
    feats = Features(enable_shading=True, enable_recursive=True,
                     enable_glossy_reflection=True)

    refs = [np.nan_to_num(run_oracle("cornell_box", res,
                                     "shading,recursive,glossy",
                                     tmp_path)) for _ in range(R)]
    ours = [np.nan_to_num(np.asarray(render_image(
        scene, Camera(), feats, RenderParams(), res, res, seed)))
        for seed in range(S)]

    base = np.asarray(render_image(scene, Camera(),
                                   Features(enable_shading=True),
                                   RenderParams(), res, res))
    ref_mean_img = np.mean(refs, axis=0)
    mask = (np.abs(ref_mean_img - np.nan_to_num(base)).max(axis=-1) > 0.02)
    assert mask.sum() > 20, "mirror region unexpectedly small"

    m_ref = np.array([r[mask].mean() for r in refs])
    m_ours = np.array([o[mask].mean() for o in ours])
    se = np.sqrt(m_ref.var(ddof=1) / R + m_ours.var(ddof=1) / S)
    diff = abs(m_ours.mean() - m_ref.mean())
    # 4 sigma + a small absolute floor for the documented tail-variance
    # difference between the chain and full-fan estimators
    bound = 4.0 * se + 0.01
    assert diff < bound, (
        f"glossy mirror-region bias {diff:.4f} exceeds CI bound "
        f"{bound:.4f} (ref {m_ref.mean():.4f}+-{m_ref.std(ddof=1):.4f}, "
        f"ours {m_ours.mean():.4f}+-{m_ours.std(ddof=1):.4f})")


def test_msaa_dof_combined(tmp_path):
    """MSAA + DoF both on: the reference weights the DoF estimate 3x vs
    the MSAA estimate (render.cpp:305-314); renderer.py:96-121 replicates
    the weighting. A wrong weight shifts every pixel's mean."""
    res = 24
    ref = run_oracle("cornell_box", res, "shading,msaa,dof", tmp_path)
    scene = load_scene_prebuilt(SceneType.CornellBox)
    feats = Features(enable_shading=True,
                     enable_multiple_rays_per_pixel=True,
                     enable_depth_of_field=True)
    ours = np.asarray(render_image(scene, Camera(), feats, RenderParams(),
                                   res, res))
    _compare(ours, ref, mean_tol=0.015, pix_tol=0.25, frac=0.9)
