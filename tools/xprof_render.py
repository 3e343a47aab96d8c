"""Capture a jax.profiler trace of the teapot-512 render and print the
top device ops by self time (parsed from the xplane proto via the
tensorboard profile plugin)."""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cge_tpu import (Camera, Features, RenderParams, SceneType,
                     load_scene_prebuilt)
from cge_tpu.render.renderer import render_image

W = H = 512
scene = load_scene_prebuilt(SceneType.Teapot)
cam = Camera()
feats = Features(enable_shading=True, enable_hard_shadow=True,
                 enable_recursive=True, enable_normal_interp=True,
                 enable_accel_structure=True)
kw = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
params = RenderParams(**kw)

np.asarray(render_image(scene, cam, feats, params, W, H, 0))  # compile

logdir = "/tmp/jax-trace-r3"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for s in range(8):
        r = render_image(scene, cam, feats, params, W, H, s)
    np.asarray(r)

pb = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane:", pb)
from tensorboard_plugin_profile.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data(pb, "trace_viewer", {})
ev = json.loads(data)["traceEvents"]
# sum durations by (pid from a TPU device plane, name)
pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
tpu_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower()}
tot = {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        tot[e["name"]] = tot.get(e["name"], 0.0) + e.get("dur", 0.0)
items = sorted(tot.items(), key=lambda kv: -kv[1])
whole = sum(tot.values())
print(f"total device-op time: {whole/1e3/8:.2f} ms/render over 8 renders")
for name, us in items[:40]:
    print(f"{us/1e3/8:8.3f} ms  {100*us/whole:5.1f}%  {name[:110]}")
