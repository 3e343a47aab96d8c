"""cge_tpu — a TPU-native differentiable Whitted-style ray tracing framework.

Re-implements, TPU-first in JAX/XLA/Pallas, the full capability surface of the
reference C++ engine (Anton-Kalpakchiev/Computer-Graphics-Engine): Phong
shading, hard/soft shadows (segment + parallelogram area lights), recursive
mirror reflections, transparency, glossy reflections, barycentric normal
interpolation, texture mapping (nearest + bilinear), BVH (median + SAH
binning), multi-sample AA, depth of field, bloom, TOML-config CLI — plus
capabilities the reference lacks: end-to-end differentiability (pixel
gradients to vertices/materials/lights/textures), deterministic threefry
sampling, and SPMD scale-out over TPU meshes via shard_map.

The compute path is a *wavefront* renderer: instead of the reference's
per-pixel recursion (src/render.cpp:27-150) we exploit the fact that every
deterministic bounce is affine in its child ray's radiance
(result = A·local + B·child) and carry (origin, direction, weight, accum)
through a bounded, statically-unrolled bounce loop over the whole ray batch.
"""

__version__ = "0.1.0"

from cge_tpu.types import Features, RenderParams
from cge_tpu.scene.scene import (SceneArrays, load_scene_from_file,
                                 load_scene_prebuilt, SceneType)
from cge_tpu.camera import Camera
from cge_tpu.render.renderer import (RenderContext, prepare_render,
                                     render_image, render_image_u8,
                                     render_images, stack_cameras)
from cge_tpu.config import CameraConfig, Config, read_config_file

__all__ = [
    "Features",
    "RenderParams",
    "SceneArrays",
    "SceneType",
    "load_scene_prebuilt",
    "load_scene_from_file",
    "Camera",
    "CameraConfig",
    "Config",
    "read_config_file",
    "RenderContext",
    "prepare_render",
    "render_image",
    "render_image_u8",
    "render_images",
    "stack_cameras",
]
