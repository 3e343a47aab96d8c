"""Per-op device attribution of the dragon-512 frame (r5): where do the
250 ms go? Same xplane parse as xprof_render.py, dragon stand-in scene."""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import DRAGON_OBJ
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
kw = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
params = RenderParams(**kw)
ctx = prepare_render(scene, feats, params)
np.asarray(render_image_u8(scene, cam, feats, params, W, H, 0, ctx))

logdir = "/tmp/jax-trace-r5d"
os.system(f"rm -rf {logdir}")
N = 4
with jax.profiler.trace(logdir):
    for s in range(N):
        r = render_image_u8(scene, cam, feats, params, W, H, s, ctx)
    np.asarray(r)

pb = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane:", pb)
from tensorboard_plugin_profile.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data(pb, "trace_viewer", {})
ev = json.loads(data)["traceEvents"]
pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
tpu_pids = {p for p, n in pid_names.items()
            if "TPU" in n or "/device" in n.lower()}
tot, cnt = {}, {}
for e in ev:
    if e.get("ph") == "X" and e.get("pid") in tpu_pids:
        tot[e["name"]] = tot.get(e["name"], 0.0) + e.get("dur", 0.0)
        cnt[e["name"]] = cnt.get(e["name"], 0) + 1
items = sorted(tot.items(), key=lambda kv: -kv[1])
whole = sum(tot.values())
print(f"total device-op time: {whole/1e3/N:.2f} ms/render over {N} renders")
for name, us in items[:40]:
    print(f"{us/1e3/N:9.3f} ms n={cnt[name]//N:<4d} {100*us/whole:5.1f}%  {name[:100]}")
