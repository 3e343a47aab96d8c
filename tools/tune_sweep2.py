"""Stage decomposition of the cluster sweep + wider br sweep."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cge_tpu import Camera, SceneType, load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.ops.pallas.cluster_sweep import (FLT_MAX, _block_entry_keys,
                                              pack_cluster_tiles,
                                              pallas_cluster_tris)
from cge_tpu.render.renderer import _tile_swizzle


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def bench(name, f, *args, reps=10):
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    sync(r)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:7.2f} ms", flush=True)


scene = load_scene_prebuilt(SceneType.Teapot)
W = H = 512
grid = pixel_grid(W, H).reshape(-1, 2)
sw, _ = _tile_swizzle(W, H)
o, d = Camera().generate_rays(grid[sw])
tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
pack = jax.jit(pack_cluster_tiles, static_argnames=("hbm",))
perm = scene.cluster_perm
aabbs, tiles = pack(scene.vertices, scene.tris, perm)
sync(tiles)
L = aabbs.shape[0]
print(f"L={L} C={tiles.shape[1]}")

for br in (512, 1024, 2048, 4096):
    NB = o.shape[0] // br
    rays = jnp.concatenate([o.T, d.T, tmax[None], jnp.zeros((1, o.shape[0]))],
                           axis=0).reshape(8, NB, br).transpose(1, 0, 2)

    keys_f = jax.jit(lambda r, a: _block_entry_keys(r, a))
    bench(f"keys pass       br={br}", keys_f, rays, aabbs)

    def sort_f(r, a):
        k = _block_entry_keys(r, a)
        order = jnp.argsort(k, axis=-1).astype(jnp.int32)
        return jnp.take_along_axis(k, order, axis=-1)
    bench(f"keys + argsort  br={br}", jax.jit(sort_f), rays, aabbs)

    full = jax.jit(lambda o, d, t, br=br: pallas_cluster_tris(
        o, d, t, aabbs, tiles, perm, br=br))
    bench(f"full sweep      br={br}", full, o, d, tmax)
