"""Interactive application — the reference's GUI mode re-expressed as a
local web app over the cge_tpu library.

The reference's interactive surface (/root/reference/src/main.cpp:45-477):
a GLFW window with an ImGui panel — view-mode switch (rasterization /
ray-traced), scene picker, feature toggles + sliders, a light editor with a
translation gizmo, debug-ray shooting on the R key, BVH debug overlays, and
a "Render to file" button. A TPU framework has no GL window, so the same
capabilities live behind a browser UI served by a tiny stdlib HTTP server:
the server holds an AppState (scene, camera, features, params, debug state)
and renders frames on demand (raster preview or ray trace), while the page
provides the panel and trackball-style mouse interaction.

Run: python -m cge_tpu.app [--port 8642] [--scene cornell_box]
"""

from cge_tpu.app.state import AppState

__all__ = ["AppState"]
