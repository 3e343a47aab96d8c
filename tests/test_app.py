"""Interactive app: state transitions and the HTTP API.

Each AppState method mirrors an ImGui interaction of the reference
(/root/reference/src/main.cpp:120-477); tests drive the same flows
headlessly at small resolutions."""

import http.client
import json
import os

import numpy as np
import pytest

from cge_tpu.app.state import AppState


@pytest.fixture(scope="module")
def app():
    return AppState(scene="cornell_box", width=48, height=48,
                    output_dir="/tmp/cge_test_out")


def test_initial_state(app):
    s = app.state_json()
    assert s["scene"] == "cornell_box"
    assert s["view_mode"] == "raster"
    assert len(s["lights"]) == 1 and s["lights"][0]["kind"] == "PointLight"
    assert s["num_tris"] == 32
    assert s["bvh"]["num_levels"] >= 1


def test_raster_frame(app):
    img = app.frame()
    assert img.shape == (48, 48, 3) and img.dtype == np.uint8
    assert img.max() > 10


def test_raytrace_frame_and_switch(app):
    app.set_view(mode="raytrace")
    img = app.frame()
    assert img.shape == (48, 48, 3)
    assert img.max() > 10
    app.set_view(mode="raster")


def test_camera_ops_change_frame(app):
    before = app.frame()
    app.camera_op("orbit", 40.0, 10.0)
    after = app.frame()
    assert (before != after).any()
    app.camera_op("reset")


def test_feature_toggle(app):
    # feature flags act on the ray-traced view (the raster preview is the
    # fixed-function GL path, indifferent to them — same as the reference)
    app.set_view(mode="raytrace")
    app.update_features({"enable_shading": False})
    flat = app.frame()
    app.update_features({"enable_shading": True})
    lit = app.frame()
    app.set_view(mode="raster")
    assert (flat != lit).any()


def test_light_editor_roundtrip(app):
    n0 = len(app.lights)
    app.add_light("segment")
    assert len(app.lights) == n0 + 1
    app.update_light(n0, {"color0": (0.0, 1.0, 0.0)})
    assert app.light_list()[n0]["color0"] == [0.0, 1.0, 0.0]
    app.remove_light(n0)
    assert len(app.lights) == n0


def test_light_edit_affects_render(app):
    app.set_view(mode="raytrace")
    before = app.frame()
    old = app.light_list()[0]["position"]
    app.update_light(0, {"position": (0.0, 0.3, 0.0)})
    after = app.frame()
    app.update_light(0, {"position": old})
    app.set_view(mode="raster")
    assert (before != after).any()


def test_debug_ray_overlay(app):
    # recursion on so the replay spawns mirror children (the reference's
    # debug ray recurses only per the active feature set, render.cpp:27-150)
    app.update_features({"enable_shading": True, "enable_hard_shadow": True,
                         "enable_recursive": True})
    # find a pixel whose primary hit is the mirror tall box (ks != 0) so
    # the replay spawns a mirror child level
    for nx in (-0.3, -0.2, -0.1, 0.0, 0.1, 0.2, 0.3):
        app.shoot_debug_ray(nx, -0.1)
        if len(app.debug_levels) >= 2:
            break
    assert len(app.debug_levels) >= 2   # eye ray + mirror child level
    assert app.debug_levels[0].hit.any()
    img = app.frame()             # raster view replays the stored ray
    app.clear_debug_ray()
    img2 = app.frame()
    assert (img != img2).any()


def test_bvh_overlay(app):
    app.set_bvh_debug(level=0)
    img = app.frame()
    app.set_bvh_debug(level=-1)
    base = app.frame()
    assert (img != base).any()
    # leaf overlay
    app.set_bvh_debug(leaf=1)
    leafimg = app.frame()
    app.set_bvh_debug(leaf=-1)
    assert (leafimg != base).any()


def test_render_to_file(app):
    path, ms = app.render_to_file(32, 32)
    assert os.path.exists(path) and path.endswith(".bmp")
    assert ms > 0


def test_scene_switch(app):
    app.set_scene("cube")
    assert app.state_json()["scene"] == "cube"
    assert app.light_list()[0]["kind"] == "SegmentLight"
    app.set_scene("cornell_box")


def test_obj_path_load(app):
    app.set_scene("/root/reference/data/triangle.obj")
    assert app.state_json()["num_tris"] == 1
    app.set_scene("cornell_box")


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def server():
    from cge_tpu.app.server import serve
    state = AppState(scene="single_triangle", width=32, height=32)
    httpd = serve(state, port=0, background=True)
    yield httpd.server_address[1]
    httpd.shutdown()


def _req(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request(method, path,
                 body=None if body is None else json.dumps(body),
                 headers={"Content-Type": "application/json"})
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, r.getheader("Content-Type"), data


def test_http_ui_and_state(server):
    st, ct, data = _req(server, "GET", "/")
    assert st == 200 and "text/html" in ct and b"cge_tpu" in data
    st, _, data = _req(server, "GET", "/api/state")
    assert st == 200
    s = json.loads(data)
    assert s["scene"] == "single_triangle"


def test_http_frame_png(server):
    st, ct, data = _req(server, "GET", "/api/frame")
    assert st == 200 and ct == "image/png"
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_http_mutations(server):
    st, _, data = _req(server, "POST", "/api/camera",
                       {"op": "orbit", "dx": 10, "dy": 5})
    assert st == 200 and json.loads(data)["ok"]
    st, _, data = _req(server, "POST", "/api/features",
                       {"enable_shading": True})
    assert json.loads(data)["state"]["features"]["enable_shading"] is True
    st, _, data = _req(server, "POST", "/api/light",
                       {"op": "add", "kind": "point"})
    assert len(json.loads(data)["state"]["lights"]) == 2
    st, _, data = _req(server, "POST", "/api/debug_ray",
                       {"x": 0.0, "y": 0.0})
    assert json.loads(data)["ok"]


def test_http_bad_requests(server):
    st, _, data = _req(server, "POST", "/api/scene", {"scene": "nope"})
    assert st == 400 and "error" in json.loads(data)
    st, _, _ = _req(server, "GET", "/api/nonexistent")
    assert st == 404


def test_add_light_reference_defaults(app):
    """The Add buttons use the reference's exact initial values
    (main.cpp:348-368)."""
    n0 = len(app.lights)
    app.add_light("segment")
    s = app.light_list()[n0]
    assert s["endpoint1"] == [1.0, 1.0, 1.0]
    assert s["color0"] == [1.0, 0.0, 0.0] and s["color1"] == [0.0, 0.0, 1.0]
    app.add_light("parallelogram")
    p = app.light_list()[n0 + 1]
    assert p["color0"] == [1.0, 0.0, 0.0] and p["color3"] == [1.0, 1.0, 1.0]
    app.remove_light(n0 + 1)
    app.remove_light(n0)


def test_gizmo_point_light_drag(app):
    """ImGuizmo translation parity (main.cpp:295-297): a drag along a
    gizmo arm moves the selected point light along that world axis only."""
    app.selected_light = 0
    app.selected_handle = 0
    g = app.state_json()["gizmo"]
    assert g is not None and g["handle_names"] == ["position"]
    before = np.array(app.light_list()[0]["position"])
    # drag along the screen direction of the x arm -> pure +x motion
    sdir = (np.array(g["axes_px"][0]) - np.array(g["anchor_px"]))
    app.gizmo_drag(0, float(sdir[0]), float(sdir[1]))
    after = np.array(app.light_list()[0]["position"])
    delta = after - before
    assert delta[0] > 1e-4            # moved toward +x (full arm length)
    assert abs(delta[1]) < 1e-6 and abs(delta[2]) < 1e-6
    app.update_light(0, {"position": tuple(before)})


def test_gizmo_segment_endpoint_handles(app):
    """Endpoint combo (main.cpp:301-311): handle 1 moves endpoint1 only."""
    n0 = len(app.lights)
    app.add_light("segment")
    app.select_handle(1)
    g = app.state_json()["gizmo"]
    assert g["handle_names"] == ["endpoint0", "endpoint1"]
    e0 = app.light_list()[n0]["endpoint0"]
    sdir = (np.array(g["axes_px"][1]) - np.array(g["anchor_px"]))
    app.gizmo_drag(1, float(sdir[0]), float(sdir[1]))
    lit = app.light_list()[n0]
    assert lit["endpoint0"] == e0
    assert abs(lit["endpoint1"][1] - 1.0) > 1e-4
    app.remove_light(n0)


def test_gizmo_parallelogram_vertex_updates_edge(app):
    """Vertex drags recompute edges (main.cpp:330-336)."""
    n0 = len(app.lights)
    app.add_light("parallelogram")
    app.select_handle(1)              # vertex1 = v0 + edge01
    g = app.state_json()["gizmo"]
    assert g["handle_names"] == ["v0", "vertex1", "vertex2"]
    v0 = app.light_list()[n0]["v0"]
    sdir = (np.array(g["axes_px"][2]) - np.array(g["anchor_px"]))
    app.gizmo_drag(2, float(sdir[0]), float(sdir[1]))
    lit = app.light_list()[n0]
    assert lit["v0"] == v0            # anchor vertex unchanged
    assert abs(lit["edge01"][2]) > 1e-4   # edge01 absorbed the z motion
    assert lit["edge02"] == [0.0, 1.0, 0.0]
    app.remove_light(n0)


def test_gizmo_overlay_draws(app):
    app.selected_light = 0
    with_g = app.frame()
    app.selected_light = -1
    without = app.frame()
    app.selected_light = 0
    assert (with_g != without).any()


def test_raytrace_white_stamp(app):
    """The interactive raytrace view stamps screen pixel (0,0) white after
    each trace (main.cpp:468) — bottom-left of the image under setPixel's
    y-flip (screen.cpp:45). Quirk ledger §2.5 #9."""
    app.set_view(mode="raytrace")
    img = app.frame()
    assert (img[-1, 0] == 255).all()
    app.set_view(mode="raster")
    img = app.frame()  # raster view has no stamp
    assert not (img[-1, 0] == 255).all()


def test_traversal_overlay(app):
    """debugBVHTraversal flow (main.cpp:458-460): shoot a debug ray, enable
    the traversal overlay, and the raster frame changes (gray visited-node
    wireframes). Slider > 0 filters to that depth (extension of the
    reference's vestigial level gate)."""
    app.set_view(mode="raster")
    app.update_features({"enable_accel_structure": True})
    app.clear_debug_ray()
    app.set_bvh_debug(traversal=False)
    base = app.frame().astype(int)
    app.shoot_debug_ray(0.0, 0.0)
    with_ray = app.frame().astype(int)
    app.set_bvh_debug(traversal=True, recursion_level=0)
    with_trav = app.frame().astype(int)
    assert np.abs(with_trav - with_ray).sum() > 0
    s = app.state_json()
    assert s["bvh"]["traversal"] is True
    app.set_bvh_debug(traversal=True, recursion_level=2)
    lvl2 = app.frame().astype(int)
    assert np.abs(lvl2 - base).sum() > 0
    app.set_bvh_debug(traversal=False)
    app.clear_debug_ray()


def test_sah_splits_overlay(app):
    """drawSAHSplits flow (main.cpp:255-258, 449-451): enabling the overlay
    draws candidate split planes into the raster view."""
    app.set_view(mode="raster")
    app.set_bvh_debug(sah_splits=False)
    base = app.frame().astype(int)
    app.set_bvh_debug(sah_splits=True, sah_split_level=0, sah_split_axis=0)
    overlay = app.frame().astype(int)
    assert np.abs(overlay - base).sum() > 0
    s = app.state_json()
    assert s["bvh"]["sah_splits"] is True and s["bvh"]["sah_split_axis"] == 0
    app.set_bvh_debug(sah_splits=False)
