"""Command-line renderer — the headless half of the reference's app layer.

Mirrors the CLI branch of main (/root/reference/src/main.cpp:478-535):
config echo, scene load (prebuilt registry or .obj path + config lights),
per-camera renders, timestamped BMP filenames
``{scene}_{YYYY-MM-DD-HH:MM:SS}_cam_{i}.bmp`` (main.cpp:510,521-524), and the
total wall-clock print (main.cpp:532-534).

TPU-native differences:
  - cameras render through ONE compiled executable (Camera is a traced
    pytree) instead of one std::thread per camera — the wavefront renderer
    already saturates the chip, and the reference's camera threads race on a
    by-reference lambda capture anyway (main.cpp:514-528);
  - ``command_line_rendering = false`` (the interactive OpenGL mode) has no
    GUI here; we warn and render headless. The visual-debugger equivalents
    live in cge_tpu.viz as array/image exports.

Usage: python -m cge_tpu.cli [config.toml]
With no argument, renders the default scene with a default camera
(main.cpp:48-53).
"""

from __future__ import annotations

import datetime
import os
import sys
import time

import numpy as np

from cge_tpu.config import CameraConfig, Config, read_config_file
from cge_tpu.scene.image_io import write_bmp
from cge_tpu.scene.scene import (SceneType, load_scene_from_file,
                                 load_scene_prebuilt, serialize_scene_type)
from cge_tpu.types import RenderParams


def run(config: Config, params: RenderParams | None = None) -> list:
    """Render every camera in the config; returns the written file paths."""
    from cge_tpu.render.renderer import render_image

    params = params or RenderParams()
    if isinstance(config.scene, SceneType):
        scene = load_scene_prebuilt(config.scene, config.data_path)
        scene_name = serialize_scene_type(config.scene)
    else:
        scene = load_scene_from_file(config.scene, config.lights)
        scene_name = os.path.splitext(os.path.basename(config.scene))[0]

    os.makedirs(config.output_dir, exist_ok=True)   # main.cpp:505-507
    w, h = config.window_size
    start = time.perf_counter()
    # main.cpp:510 — fmt "{:%Y-%m-%d-%H:%M:%S}"
    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H:%M:%S")

    cams = [c.to_camera(aspect=w / h) for c in config.cameras]
    # per-scene render state (accel + attr tables) prepared once and shared
    # by every camera — the reference's one-BVH-for-all-threads flow
    # (main.cpp:502, 512-531)
    from cge_tpu.render.renderer import prepare_render
    ctx = prepare_render(scene, config.features, params)
    if len(cams) > 1:
        # all cameras as ONE wavefront batch (one compiled program, one
        # launch) — the TPU-native version of the per-camera threads
        from cge_tpu.render.renderer import render_images, stack_cameras
        imgs = np.asarray(render_images(scene, stack_cameras(cams),
                                        config.features, params, w, h, 0,
                                        ctx))
    else:
        imgs = np.asarray(render_image(scene, cams[0], config.features,
                                       params, w, h, 0, ctx))[None]

    paths = []
    for i in range(len(cams)):
        filename = f"{scene_name}_{stamp}_cam_{i}.bmp"
        filepath = os.path.join(config.output_dir, filename)
        print(f"Image {i} saved to {filepath}")     # main.cpp:523
        write_bmp(filepath, imgs[i])
        paths.append(filepath)

    elapsed_ms = int((time.perf_counter() - start) * 1000)
    print(f"Rendering took {elapsed_ms} ms, {len(config.cameras)} images "
          f"rendered.")                             # main.cpp:532-534
    return paths


def main(argv=None) -> int:
    # honour JAX_PLATFORMS even when a sitecustomize already imported jax
    # with a baked-in platform (env alone is too late in that case)
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    argv = sys.argv[1:] if argv is None else argv
    if argv:                                        # main.cpp:48-53
        config = read_config_file(argv[0])
    else:
        config = Config(cli_rendering_enabled=True)
        config.cameras.append(CameraConfig())
        config.output_dir = os.getcwd()

    print(config)                                   # main.cpp:480
    if not config.cli_rendering_enabled:
        print("WARN: interactive mode is not available in cge_tpu; "
              "rendering headless instead (see cge_tpu.viz for the "
              "debug-visualization exports).", file=sys.stderr)
    if not config.cameras:
        config.cameras.append(CameraConfig())
    run(config)
    return 0


if __name__ == "__main__":
    sys.exit(main())
