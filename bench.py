#!/usr/bin/env python
"""Headline benchmark: teapot 512x512, Phong + hard shadows + recursive
mirrors + interpolated normals + acceleration structure — the reference's
heaviest shipped deterministic workload (15,704 triangles).

Prints ONE JSON line:
  {"metric": "teapot512_rays_per_s", "value": <rays/s>, "unit": "rays/s",
   "vs_baseline": <speedup over the C++ reference on this host>}

Baseline side: the real reference renderer (src/render.cpp + prebuilt
intersection lib) compiled Release-style (-O2 -DNDEBUG -fopenmp, OpenMP
scanline loop active, /root/reference/src/render.cpp:277-280) via
tools/oracle/bench_main.cpp, same scene/camera/features/resolution. If the
binary is missing and cannot be built, falls back to the last measured
number (LAST_MEASURED_REF_MS).

Ray accounting (for the rays/s metric): primary rays + the shadow ray each
of them spawns per point light at the first bounce — the same count for both
sides; deeper bounces are scene-dependent work both sides share.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
ORACLE_DIR = os.path.join(REPO, "tools", "oracle")
BENCH_BIN = os.path.join(ORACLE_DIR, "bench_oracle")

W = H = 512
SCENE = "teapot"
FEATURES = "shading,hard_shadow,recursive,normal_interp,accel"
REPS = 3
# measured on the round-1 driver host (2-core, -O2 -DNDEBUG -fopenmp)
LAST_MEASURED_REF_MS = 309.6


def reference_ms() -> float:
    if not os.path.exists(BENCH_BIN):
        build = os.path.join(ORACLE_DIR, "build_bench.sh")
        if os.path.exists(build):
            try:
                subprocess.run(["bash", build], check=True, timeout=300,
                               capture_output=True)
            except Exception:
                return LAST_MEASURED_REF_MS
    if not os.path.exists(BENCH_BIN):
        return LAST_MEASURED_REF_MS
    try:
        out = subprocess.run(
            [BENCH_BIN, SCENE, str(W), str(H), FEATURES, str(REPS)],
            capture_output=True, text=True, timeout=1200, check=True).stdout
        for line in out.splitlines():
            if line.startswith("BEST_MS"):
                return float(line.split()[1])
    except Exception:
        pass
    return LAST_MEASURED_REF_MS


def main():
    sys.path.insert(0, REPO)
    import jax

    # persistent executable cache: compiles through the axon tunnel are slow
    # and highly variable; cache them across bench runs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np

    from cge_tpu import (Camera, Features, RenderParams, SceneType,
                         load_scene_prebuilt, render_image_u8)

    scene = load_scene_prebuilt(SceneType.Teapot)
    feats = Features(enable_shading=True, enable_hard_shadow=True,
                     enable_recursive=True, enable_normal_interp=True,
                     enable_accel_structure=True)
    params = RenderParams()
    cam = Camera()

    # warm up / compile; np.asarray forces full materialization (the axon
    # tunnel is async — block_until_ready alone returns early). The timed
    # artifact is the BMP byte framebuffer, the same payload the reference's
    # render materializes host-side (screen.cpp:49-60); u8 keeps the axon
    # tunnel transfer (a harness artifact, not TPU PCIe) proportionate.
    img = np.asarray(render_image_u8(scene, cam, feats, params, W, H))
    assert img.dtype == np.uint8 and img.shape == (H, W, 3)

    best_ms = float("inf")
    for r in range(1, REPS + 1):
        t0 = time.perf_counter()
        np.asarray(render_image_u8(scene, cam, feats, params, W, H, r))
        best_ms = min(best_ms, (time.perf_counter() - t0) * 1e3)

    ref_ms = reference_ms()
    n_point_lights = 1  # teapot scene: one point light (scene.cpp:66)
    rays = W * H * (1 + n_point_lights)
    rays_per_s = rays / (best_ms / 1e3)
    print(json.dumps({
        "metric": "teapot512_rays_per_s",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(ref_ms / best_ms, 3),
    }))


if __name__ == "__main__":
    main()
