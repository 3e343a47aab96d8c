"""Round-3 end-to-end tuner: teapot-512 full render across
(trace_chunk, sweep_br, exact_keys, shared_origin). Jittered seeds force
real dispatches; slope timing cancels the axon round-trip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import device_ms
from cge_tpu import (Camera, Features, RenderParams, SceneType,
                     load_scene_prebuilt)
from cge_tpu.render.renderer import render_image

W = H = 512
scene = load_scene_prebuilt(SceneType.Teapot)
cam = Camera()
feats = Features(enable_shading=True, enable_hard_shadow=True,
                 enable_recursive=True, enable_normal_interp=True,
                 enable_accel_structure=True)

ref = None
configs = []
for chunk in (16384, 65536, 262144):
    for br in (512, 1024):
        configs.append(dict(trace_chunk=chunk, sweep_br=br))
configs.append(dict(trace_chunk=65536, sweep_br=1024,
                    sweep_exact_keys=False))
configs.append(dict(trace_chunk=65536, sweep_br=1024,
                    sweep_shared_origin=False))
configs.append(dict(trace_chunk=262144, sweep_br=1024,
                    sweep_shared_origin=False))

for kw in configs:
    params = RenderParams(**kw)
    t0 = time.perf_counter()
    img = np.asarray(render_image(scene, cam, feats, params, W, H, 0))
    compile_s = time.perf_counter() - t0
    if ref is None:
        ref = img
    ok = np.allclose(img, ref, atol=2e-5)
    ms = device_ms(lambda s: render_image(scene, cam, feats, params, W, H, s),
                   n1=5, n2=20, trials=4)
    print(f"{kw}: {ms:6.2f} ms  (compile {compile_s:.0f}s, match={ok})",
          flush=True)
