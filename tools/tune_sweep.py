"""Empirical tuning sweep for the cluster kernel on the real chip.

Times pallas_cluster_tris on the teapot primary-ray workload across
cluster size C, ray-block size BR, shared_origin, and refine_members, and
reports per-config wall ms + mean supercluster visits per block.

Usage: python tools/tune_sweep.py [scene]
"""
import itertools
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
from cge_tpu.ops.bvh import build_clusters
from cge_tpu.ops.pallas.cluster_sweep import (pack_cluster_tiles,
                                              pallas_cluster_tris)
from cge_tpu.render.renderer import _tile_swizzle


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "teapot"
    scene = load_scene_prebuilt(SceneType[name.capitalize()])
    W = H = 512
    grid = pixel_grid(W, H).reshape(-1, 2)
    sw, _ = _tile_swizzle(W, H)
    o, d = Camera().generate_rays(grid[sw])
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
    pack = jax.jit(pack_cluster_tiles, static_argnames=("hbm",))

    results = []
    for C in (32, 64, 128):
        perm = jnp.asarray(build_clusters(scene.vertices, scene.tris,
                                          scene.tri_mask, cluster_size=C))
        aabbs, tiles = pack(scene.vertices, scene.tris, perm)
        sync(tiles)
        for br, so, rm in itertools.product((256, 512, 1024),
                                            (False, True), (False, True)):
            f = jax.jit(lambda o, d, t, a, tl, p, br=br, so=so, rm=rm:
                        pallas_cluster_tris(o, d, t, a, tl, p, br=br,
                                            shared_origin=so,
                                            refine_members=rm,
                                            with_stats=True))
            try:
                r = f(o, d, tmax, aabbs, tiles, perm)
                sync(r[0])
                t0 = time.perf_counter()
                for _ in range(5):
                    r = f(o, d, tmax, aabbs, tiles, perm)
                sync(r[0])
                ms = (time.perf_counter() - t0) / 5 * 1e3
                visits = float(np.asarray(r[2]).mean())
                pairs = float(np.asarray(r[2], np.float64).sum()) * C * br
                results.append((ms, C, br, so, rm, visits, pairs))
                print(f"C={C:4d} br={br:5d} shared={int(so)} refine={int(rm)}"
                      f"  {ms:7.2f} ms  visits/blk={visits:7.1f}"
                      f"  Gpairs={pairs/1e9:.2f}"
                      f"  Gpairs/s={pairs/ms/1e6:.1f}", flush=True)
            except Exception as e:
                print(f"C={C} br={br} so={so} rm={rm} FAILED: "
                      f"{str(e)[:120]}", flush=True)

    results.sort()
    print("\nbest:", results[0])


if __name__ == "__main__":
    main()
