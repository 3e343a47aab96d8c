"""Debug-visualization exports (the reference's OpenGL debuggers as
arrays/images — see cge_tpu.viz.debug)."""

from cge_tpu.viz.debug import (DebugRays, ShadowRays, aabb_segments,
                               debug_shadow_rays, debug_trace, draw_segments,
                               normal_segments, project_points)

__all__ = [
    "DebugRays", "ShadowRays", "aabb_segments", "debug_shadow_rays",
    "debug_trace", "draw_segments", "normal_segments", "project_points",
]
