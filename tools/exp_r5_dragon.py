"""r5: dragon primary-sweep grid after the field-major repack + full-cluster
packing. Times sc_n in {4, 2, 1} (and refine_members on the winner) on the
614k-tri stand-in's 262k-ray primary closest sweep, and cross-checks
hits/t/ids against a brute chunked sweep on a ray subsample.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import DRAGON_OBJ, device_ms
from cge_tpu import Camera
from cge_tpu.camera import pixel_grid
from cge_tpu.ops.intersect import build_accel
from cge_tpu.ops.pallas.cluster_sweep import pallas_cluster_tris
from cge_tpu.render.renderer import _tile_swizzle
from cge_tpu.scene.scene import PointLight, load_scene_from_file

if not os.path.exists(DRAGON_OBJ):
    from tools.make_large_asset import write_obj
    write_obj(DRAGON_OBJ)

scene = load_scene_from_file(
    DRAGON_OBJ, [PointLight(position=(-1.0, 1.0, -1.0), color=(1.0, 1.0, 1.0))])
cam = Camera()
W = H = 512
grid = pixel_grid(W, H).reshape(-1, 2)
sw, _ = _tile_swizzle(W, H)
o, d = cam.generate_rays(grid[sw])
tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
accel = jax.jit(build_accel)(scene)
print("tiles shape:", accel.tiles.shape, "bytes:",
      accel.tiles.size * 4 / 1e6, "MB", flush=True)

jig = jnp.float32(1e-7)
results = {}
for sc_n, refine in [(4, False), (2, False), (1, False), (2, True)]:
    f = jax.jit(lambda o, d, t, s=sc_n, rm=refine: pallas_cluster_tris(
        o, d, t, accel.aabbs, accel.tiles, accel.perm, sc_n=s,
        refine_members=rm, with_stats=True))
    t0 = time.time()
    r = f(o + jig, d, tmax)
    t_new, i_new, visits = map(np.asarray, r)
    print(f"sc_n={sc_n} refine={refine}: compiled+ran {time.time()-t0:.0f}s",
          flush=True)
    ms = device_ms(lambda i: f(o + jig * i, d, tmax)[0], n1=10, n2=30)
    print(f"  sweep {ms:.2f} ms, visits sum={visits.sum()} "
          f"mean={visits.mean():.1f}", flush=True)
    results[(sc_n, refine)] = (ms, t_new, i_new)

# parity on a subsample vs brute (winner config)
best = min(results, key=lambda k: results[k][0])
ms, t_new, i_new = results[best]
print("best:", best, ms, flush=True)
from cge_tpu.ops.intersect import _closest_tris_sweep
sub = np.random.RandomState(0).choice(o.shape[0], 2048, replace=False)
os_, ds_ = o[sub], d[sub]
bt, bi = jax.jit(lambda o, d: _closest_tris_sweep(
    o, d, jnp.full(o.shape[0], jnp.inf), scene.vertices, scene.tris,
    scene.tri_mask, 2048))(os_, ds_)
bt, bi = np.asarray(bt), np.asarray(bi)
tn, im = t_new[sub], i_new[sub]
hb, hc = np.isfinite(bt), np.isfinite(tn)
print("hit match:", (hb == hc).mean(), flush=True)
ok = hb & hc
print("t allclose:", np.allclose(tn[ok], bt[ok], rtol=5e-6, atol=1e-7),
      "max rel err:", float(np.abs((tn[ok] - bt[ok]) / bt[ok]).max()))
print("id match:", (im[ok] == bi[ok]).mean())
