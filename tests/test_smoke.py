"""End-to-end smoke tests: load scenes, render small images, sanity checks."""

import numpy as np
import pytest

from cge_tpu import (Camera, Features, RenderParams, SceneType,
                     load_scene_prebuilt, render_image)


@pytest.fixture(scope="module")
def triangle_scene():
    return load_scene_prebuilt(SceneType.SingleTriangle)


def test_single_triangle_flat(triangle_scene):
    """PR1 slice: flat shading off-path (enableShading=false => raw kd,
    light.cpp:163); triangle.obj has kd forced to white (scene.cpp:13).
    The default camera looks at the origin; the triangle lies in the x=0
    plane, so a band of pixels must be exactly white and the rest black."""
    cam = Camera()
    img = render_image(triangle_scene, cam, Features(), RenderParams(), 64, 64)
    img = np.asarray(img)
    assert img.shape == (64, 64, 3)
    hit = img.sum(axis=-1) > 0
    assert hit.any(), "triangle not visible"
    assert not hit.all(), "triangle covers whole frame?"
    # hit pixels are exactly kd = (1,1,1)
    np.testing.assert_allclose(img[hit], 1.0)


def test_spheres_scene_renders():
    scene = load_scene_prebuilt(SceneType.Spheres)
    cam = Camera()
    img = np.asarray(render_image(
        scene, cam, Features(enable_shading=True), RenderParams(), 48, 48))
    assert np.isfinite(img).all()
    assert (img.sum(axis=-1) > 0).any()


def test_cornell_phong_renders():
    scene = load_scene_prebuilt(SceneType.CornellBox)
    cam = Camera()
    feats = Features(enable_shading=True, enable_hard_shadow=True,
                     enable_recursive=True)
    img = np.asarray(render_image(scene, cam, feats, RenderParams(), 32, 32))
    assert img.shape == (32, 32, 3)
    # NaN pixels are parity-correct: the reference's specular quirk computes
    # std::pow(negative, 10.000002) for back-facing gate hits (shading.cpp:31)
    finite = np.isfinite(img).all(axis=-1)
    assert finite.mean() > 0.5
    assert (np.nan_to_num(img).sum(axis=-1) > 0).any()


def test_chunked_trace_matches_unchunked():
    """lax.map chunking (params.trace_chunk) must not change deterministic
    renders: same rays, same scene, different wavefront partitioning."""
    scene = load_scene_prebuilt(SceneType.CornellBox)
    cam = Camera()
    feats = Features(enable_shading=True, enable_hard_shadow=True,
                     enable_recursive=True)
    a = np.asarray(render_image(scene, cam, feats, RenderParams(), 32, 32))
    b = np.asarray(render_image(
        scene, cam, feats, RenderParams(trace_chunk=256), 32, 32))
    np.testing.assert_array_equal(np.nan_to_num(a), np.nan_to_num(b))


def test_batched_cameras_match_sequential():
    """render_images (lax.map camera batch) == per-camera render_image."""
    from cge_tpu import render_images, stack_cameras

    scene = load_scene_prebuilt(SceneType.CornellBox)
    feats = Features(enable_shading=True, enable_hard_shadow=True)
    params = RenderParams()
    cams = [Camera(), Camera(fovy=1.1, distance=2.2, rotation=(-0.2, 0.7, 0.0))]
    batch = np.asarray(render_images(scene, stack_cameras(cams), feats,
                                     params, 24, 24, 0))
    assert batch.shape == (2, 24, 24, 3)
    for i, cam in enumerate(cams):
        single = np.asarray(render_image(scene, cam, feats, params, 24, 24, i))
        np.testing.assert_allclose(np.nan_to_num(batch[i]),
                                   np.nan_to_num(single), rtol=2e-5, atol=1e-6)


def test_prepared_context_matches_inline():
    """render_image with a prepare_render context must equal the inline
    (per-call rebuild) path bit-for-bit — same accel, same attribute
    tables, just built once (r4 RenderContext; verified byte-identical on
    TPU teapot-512 as well)."""
    from cge_tpu import prepare_render

    scene = load_scene_prebuilt(SceneType.CornellBox)
    feats = Features(enable_shading=True, enable_hard_shadow=True,
                     enable_recursive=True, enable_accel_structure=True)
    params = RenderParams()
    cam = Camera()
    ctx = prepare_render(scene, feats, params)
    a = np.asarray(render_image(scene, cam, feats, params, 32, 32))
    b = np.asarray(render_image(scene, cam, feats, params, 32, 32, 0, ctx))
    np.testing.assert_array_equal(np.nan_to_num(a), np.nan_to_num(b))


def test_all_diffuse_tree_collapse_matches_generic():
    """all_diffuse scenes (every ks == 0) run the TRANS+REC tree as a
    single-child chain; radiance must be bitwise equal to the generic
    two-child tree (the dropped mirror branch carries exact zeros)."""
    import dataclasses

    scene = load_scene_prebuilt(SceneType.Cube)
    assert scene.all_diffuse
    feats = Features(enable_shading=True, enable_soft_shadow=True,
                     enable_recursive=True, enable_transparency=True)
    params = RenderParams(ray_depth=3, extra_transparency_unroll=2)
    a = np.asarray(render_image(scene, Camera(), feats, params, 16, 16))
    generic = dataclasses.replace(scene, all_diffuse=False)
    b = np.asarray(render_image(generic, Camera(), feats, params, 16, 16))
    np.testing.assert_array_equal(np.nan_to_num(a), np.nan_to_num(b))
