"""Rasterization preview — the TPU-native equivalent of the reference's
legacy-OpenGL rasterization view (ViewMode::Rasterization,
/root/reference/src/main.cpp:380-464 + drawSceneOpenGL main.cpp:608-658).

The reference previews the scene with the fixed-function GL pipeline:
vertex lighting (point lights only, zero ambient/specular), Gouraud
interpolation, a z-buffer, plus unlit overlays for the lights and the
trackball's look-at marker. Here the same capability is a batched JAX
pipeline: GL-convention matrices -> per-vertex GL lighting -> screen-space
edge-function rasterizer with a z-buffer -> deferred Gouraud shading.
"""

from cge_tpu.raster.matrices import look_at, perspective, project_vertices
from cge_tpu.raster.lighting import gl_point_lights, gl_vertex_colors
from cge_tpu.raster.rasterize import rasterize, shade_gouraud
from cge_tpu.raster.preview import render_preview

__all__ = [
    "look_at", "perspective", "project_vertices",
    "gl_point_lights", "gl_vertex_colors",
    "rasterize", "shade_gouraud",
    "render_preview",
]
