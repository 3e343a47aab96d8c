"""Decompose the teapot bench: kernel vs stages vs transfer (axon-safe sync)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cge_tpu import Camera, Features, RenderParams, SceneType, load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.ops.intersect import build_accel, closest_hit_chunked
from cge_tpu.ops.pallas.cluster_sweep import pallas_cluster_tris
from cge_tpu.render.renderer import render_image
from cge_tpu.render.wavefront import hit_attributes, trace
from cge_tpu.render.lights import light_contribution

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def sync(x):
    """Force full materialization (axon block_until_ready returns early)."""
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def bench(name, f, *args, reps=None):
    """Slope-timed per-call ms (see bench.device_ms): the axon tunnel adds
    a large variable fixed cost per synchronization that would otherwise
    dominate these sub-10ms stages. f must take a call index i and vary its
    inputs with it — identical dispatches can be served from cache and
    time at ~0."""
    from bench import device_ms
    ms = device_ms(f, n1=4, n2=12, trials=3)
    print(f"{name}: {ms:.2f} ms")
    return ms / 1e3


W = H = 512
scene = load_scene_prebuilt(SceneType.Teapot)
cam = Camera()
feats = Features(enable_shading=True, enable_hard_shadow=True,
                 enable_recursive=True, enable_normal_interp=True,
                 enable_accel_structure=True)
params = RenderParams()

grid = pixel_grid(W, H).reshape(-1, 2)
o, d = cam.generate_rays(grid)
o, d = jax.device_put(o), jax.device_put(d)
tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)

accel = jax.jit(lambda s: build_accel(s))(scene)
sync(accel.tiles)
print(f"tris={scene.tris.shape[0]} L={accel.tiles.shape[0]} rays={o.shape[0]}")

kern = jax.jit(lambda o, d, t: pallas_cluster_tris(
    o, d, t, accel.aabbs, accel.tiles, accel.perm))
jig = jnp.float32(1e-7)   # per-call input jitter: forces re-execution
bench("closest sweep (262k rays)", lambda i: kern(o + jig * i, d, tmax))
kern_so = jax.jit(lambda o, d, t: pallas_cluster_tris(
    o, d, t, accel.aabbs, accel.tiles, accel.perm, shared_origin=True))
bench("closest sweep shared-origin", lambda i: kern_so(o + jig * i, d, tmax))
kern_ah = jax.jit(lambda o, d, t: pallas_cluster_tris(
    o, d, t, accel.aabbs, accel.tiles, accel.perm, any_hit=True))
bench("any-hit sweep", lambda i: kern_ah(o + jig * i, d, tmax))

ids_f = jax.jit(lambda o, d, t: closest_hit_chunked(
    scene, o, d, t, accel=accel))
ids = ids_f(o, d, tmax)
sync(ids.t)

attr_f = jax.jit(lambda o, d, ids: hit_attributes(scene, o, d, ids, feats))
bench("hit_attributes", lambda i: attr_f(o + jig * i, d, ids))
attrs = attr_f(o, d, ids)

key = jax.random.PRNGKey(0)
light_f = jax.jit(lambda o, d, a: light_contribution(
    scene, o, d, a.t, a.normal, a.kd, a.ks, a.shininess, feats, params, key,
    alive=a.hit, accel=accel))
bench("light_contribution (shadow sweep + shade)",
      lambda i: light_f(o + jig * i, d, attrs))

trace_f = jax.jit(lambda o, d: trace(scene, o, d, feats, params, key,
                                     accel=accel))
bench("full trace 262k (unchunked)", lambda i: trace_f(o + jig * i, d))

rend = jax.jit(lambda s: render_image(scene, cam, feats, params, W, H, s))
bench("render_image (seed varies)", lambda i: rend(i))

img = render_image(scene, cam, feats, params, W, H, 0)
sync(img)
t0 = time.perf_counter()
for _ in range(3):
    np.asarray(render_image(scene, cam, feats, params, W, H, 0))
print(f"render_image + full np.asarray: {(time.perf_counter()-t0)/3*1e3:.1f} ms")

t0 = time.perf_counter()
for _ in range(3):
    np.asarray(img)
print(f"np.asarray of cached image (transfer only): "
      f"{(time.perf_counter()-t0)/3*1e3:.1f} ms")
