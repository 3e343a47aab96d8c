"""Rasterization preview: matrices, GL vertex lighting, z-buffer
rasterizer, and the composed preview frame.

Reference behavior being mirrored: the fixed-function rasterization view
(/root/reference/src/main.cpp:380-464, 540-658; draw.cpp:27-36, 64-77)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cge_tpu import Camera, SceneType, load_scene_prebuilt
from cge_tpu.raster import (gl_point_lights, gl_vertex_colors, look_at,
                            perspective, project_vertices, rasterize,
                            render_preview, shade_gouraud)
from cge_tpu.raster.matrices import camera_matrices


# ---------------------------------------------------------------------------
# matrices
# ---------------------------------------------------------------------------

def test_look_at_maps_center_to_minus_z():
    eye = np.array([1.0, 2.0, 3.0])
    center = np.array([0.0, 0.0, 0.0])
    v = np.asarray(look_at(eye, center, (0.0, 1.0, 0.0)))
    ch = v @ np.append(center, 1.0)
    # center lands on the -z axis at the eye distance
    np.testing.assert_allclose(ch[:2], 0.0, atol=1e-5)
    np.testing.assert_allclose(ch[2], -np.linalg.norm(eye - center),
                               rtol=1e-5)
    eh = v @ np.append(eye, 1.0)
    np.testing.assert_allclose(eh[:3], 0.0, atol=1e-5)


def test_perspective_ndc_range():
    p = np.asarray(perspective(np.radians(50.0), 1.0, 0.01, 100.0))
    for zeye, want in [(-0.01, -1.0), (-100.0, 1.0)]:
        clip = p @ np.array([0.0, 0.0, zeye, 1.0])
        np.testing.assert_allclose(clip[2] / clip[3], want, atol=1e-4)


def test_project_vertices_viewport():
    cam = Camera()
    view, proj = camera_matrices(cam, 64, 64)
    # the look-at point projects to the screen center
    xy, z, w = project_vertices(jnp.asarray([[0.0, 0.0, 0.0]]), view, proj,
                                64, 64)
    np.testing.assert_allclose(np.asarray(xy)[0], [32.0, 32.0], atol=1e-3)
    assert float(w[0]) > 0


# ---------------------------------------------------------------------------
# GL vertex lighting
# ---------------------------------------------------------------------------

def test_gl_point_lights_expansion():
    scene = load_scene_prebuilt(SceneType.Cube)   # one segment light
    pos, col, mask = (np.asarray(x) for x in gl_point_lights(scene))
    live = mask.astype(bool)
    assert live.sum() == 2                         # two endpoint lights
    np.testing.assert_allclose(col[live],
                               0.5 * np.stack([np.asarray(scene.seg_c0[0]),
                                               np.asarray(scene.seg_c1[0])]))


def test_gl_vertex_colors_diffuse_only():
    scene = load_scene_prebuilt(SceneType.SingleTriangle)
    cols = np.asarray(gl_vertex_colors(scene))
    v = np.asarray(scene.vertices)[:3]
    n = np.asarray(scene.normals)[:3]
    lp = np.asarray(scene.point_pos)[0]
    lc = np.clip(np.asarray(scene.point_color)[0], 0, 1)
    ld = lp - v
    ld /= np.linalg.norm(ld, axis=1, keepdims=True)
    want = np.clip((n * ld).sum(1)[:, None].clip(min=0) * lc
                   * np.asarray(scene.mat_kd)[0], 0, 1)
    np.testing.assert_allclose(cols[:3], want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# rasterizer
# ---------------------------------------------------------------------------

def _screen_tri(xy_list, z_list):
    """Geometry already in window coords: identity-project helpers."""
    xy = jnp.asarray(xy_list, jnp.float32)
    z = jnp.asarray(z_list, jnp.float32)
    w = jnp.ones(len(xy_list), jnp.float32)
    return xy, z, w


def test_rasterize_single_triangle_coverage():
    xy, z, w = _screen_tri([[1.0, 1.0], [15.0, 1.0], [1.0, 15.0]],
                           [0.0, 0.0, 0.0])
    tid, depth = rasterize(xy, z, w, jnp.asarray([[0, 1, 2]]), 16, 16)
    tid = np.asarray(tid)
    assert tid[2, 2] == 0            # interior pixel center (2.5, 2.5)
    assert tid[14, 14] == -1         # outside the hypotenuse
    assert (np.asarray(depth)[tid == -1] == 1.0).all()


def test_rasterize_depth_test_and_tie():
    # two overlapping triangles; nearer z wins, equal z -> first drawn
    xy = jnp.asarray([[0, 0], [16, 0], [0, 16],
                      [0, 0], [16, 0], [0, 16],
                      [0, 0], [16, 0], [0, 16]], jnp.float32)
    z = jnp.asarray([0.5] * 3 + [-0.5] * 3 + [-0.5] * 3, jnp.float32)
    w = jnp.ones(9, jnp.float32)
    tris = jnp.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
    tid, depth = rasterize(xy, z, w, tris, 16, 16)
    assert np.asarray(tid)[4, 4] == 1          # closer beats first
    np.testing.assert_allclose(np.asarray(depth)[4, 4], -0.5)


def test_rasterize_two_sided():
    # clockwise orientation must still fill (GL_FRONT and GL_BACK fill)
    xy, z, w = _screen_tri([[1.0, 1.0], [1.0, 15.0], [15.0, 1.0]],
                           [0.0, 0.0, 0.0])
    tid, _ = rasterize(xy, z, w, jnp.asarray([[0, 1, 2]]), 16, 16)
    assert np.asarray(tid)[2, 2] == 0


def test_rasterize_drops_behind_camera():
    xy, z, w = _screen_tri([[1.0, 1.0], [15.0, 1.0], [1.0, 15.0]],
                           [0.0, 0.0, 0.0])
    w = w.at[1].set(-1.0)
    tid, _ = rasterize(xy, z, w, jnp.asarray([[0, 1, 2]]), 16, 16)
    assert (np.asarray(tid) == -1).all()


def test_shade_gouraud_interpolates():
    xy, z, w = _screen_tri([[0.0, 0.0], [16.0, 0.0], [0.0, 16.0]],
                           [0.0, 0.0, 0.0])
    tris = jnp.asarray([[0, 1, 2]])
    tid, _ = rasterize(xy, z, w, tris, 16, 16)
    cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    img = np.asarray(shade_gouraud(tid, xy, z, tris, cols))
    # near vertex 0 -> mostly red; background black
    assert img[0, 0, 0] > 0.9
    assert (img[15, 15] == 0).all()
    # barycentric weights sum to 1 -> channels sum to 1 on covered pixels
    covered = np.asarray(tid) >= 0
    np.testing.assert_allclose(img[covered].sum(-1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# composed preview
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scene_type", [SceneType.CornellBox,
                                        SceneType.Spheres])
def test_render_preview_smoke(scene_type):
    scene = load_scene_prebuilt(scene_type)
    img = np.asarray(render_preview(scene, Camera(), 96, 96))
    assert img.shape == (96, 96, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    assert img.max() > 0.05          # something got lit


def test_render_preview_lights_toggle():
    scene = load_scene_prebuilt(SceneType.CornellBoxParallelogramLight)
    with_l = np.asarray(render_preview(scene, Camera(), 96, 96))
    without = np.asarray(render_preview(scene, Camera(), 96, 96,
                                        show_lights=False))
    # the parallelogram light quad + look-at marker add visible pixels
    assert (np.abs(with_l - without).max(-1) > 0.05).sum() > 10
