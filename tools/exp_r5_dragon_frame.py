"""r5: dragon-512 FRAME grid — trace_chunk and per-sweep sc_n knobs.

The r5 xplane attribution (PERF_r05.md) shows the frame is dominated by
bounce-level closest sweeps (92.9 ms) + any-hit sweeps (67 ms) + dense
light-slot work (68 ms). With field-major DMA 8x cheaper, finer visit
granularity may win for divergent bounce batches; bigger trace chunks cut
launch counts 4x.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import DRAGON_OBJ, device_ms
from cge_tpu import Camera, Features, RenderParams, prepare_render
from cge_tpu.render.renderer import render_image_u8
from cge_tpu.scene.scene import PointLight, load_scene_from_file

W = H = 512
if not os.path.exists(DRAGON_OBJ):
    from tools.make_large_asset import write_obj
    write_obj(DRAGON_OBJ)
scene = load_scene_from_file(
    DRAGON_OBJ, [PointLight(position=(-1.0, 1.0, -1.0), color=(1.0, 1.0, 1.0))])
cam = Camera()
feats = Features(enable_shading=True, enable_hard_shadow=True,
                 enable_recursive=True, enable_normal_interp=True,
                 enable_accel_structure=True)

CONFIGS = [
    ("baseline", {}),
    ("chunk262k", {"trace_chunk": 262144}),
    ("scn1", {"sweep_sc_n": 1}),
    ("anyhit_scn1", {"sweep_anyhit_sc_n": 1}),
    ("scn1+anyhit1+262k", {"sweep_sc_n": 1, "sweep_anyhit_sc_n": 1,
                           "trace_chunk": 262144}),
]
if len(sys.argv) > 1:
    CONFIGS = [(f"cli", json.loads(sys.argv[1]))]

base_img = None
for name, kw in CONFIGS:
    params = RenderParams(**kw)
    ctx = prepare_render(scene, feats, params)
    img = np.asarray(render_image_u8(scene, cam, feats, params, W, H, 0, ctx))
    if base_img is None:
        base_img = img
    ms = device_ms(lambda s: render_image_u8(scene, cam, feats, params,
                                             W, H, s, ctx), n1=3, n2=9)
    mism = float((img != base_img).mean())
    print(f"{name:22s}: {ms:8.2f} ms  mismatch_vs_base={mism:.5f}",
          flush=True)
