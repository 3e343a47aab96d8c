"""Scale benchmark: closest-hit throughput on a ~1M-triangle scene.

The reference's heaviest shipped asset is the 15.7k-triangle teapot (its
dragon.obj is referenced by src/scene.cpp:70-73 but not shipped in data/),
so large-scene behavior is exercised with a procedural stand-in: a grid of
displaced icospheres at ~1M triangles. This drives the sweep kernel's
HBM-resident traversal (tiles too big for VMEM, DMA-on-demand — see
cge_tpu.ops.pallas.cluster_sweep).

Usage: PYTHONPATH=. python tools/bench_scale.py [n_grid] [subdiv]
Prints one JSON line per configuration.
"""

import json
import sys
import time

import numpy as np


def build_scene(n_grid: int = 14, subdiv: int = 4):
    import jax.numpy as jnp

    from cge_tpu.ops.bvh import build_clusters
    from cge_tpu.raster.preview import icosphere

    iv, it = icosphere(subdiv)
    rng = np.random.default_rng(0)
    VS, TS = [], []
    off = 0
    for i in range(n_grid):
        for j in range(n_grid):
            c = np.array([(i - n_grid / 2) * 0.5, (j - n_grid / 2) * 0.5,
                          3.0])
            r = 0.2 + 0.05 * rng.random()
            VS.append(iv * r + c)
            TS.append(it + off)
            off += len(iv)
    V = np.concatenate(VS).astype(np.float32)
    T = np.concatenate(TS).astype(np.int32)
    mask = np.ones(len(T), bool)
    t0 = time.perf_counter()
    perm = build_clusters(V, T, mask)
    build_ms = (time.perf_counter() - t0) * 1e3
    return jnp.asarray(V), jnp.asarray(T), jnp.asarray(perm), build_ms


def main():
    n_grid = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    subdiv = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from cge_tpu.camera import Camera, pixel_grid
    from cge_tpu.ops.pallas.cluster_sweep import (pack_cluster_tiles,
                                                  pallas_cluster_tris)

    V, T, perm, build_ms = build_scene(n_grid, subdiv)
    pack = jax.jit(pack_cluster_tiles, static_argnames=("hbm",))
    aabbs, tiles = pack(V, T, perm)
    np.asarray(aabbs)

    from cge_tpu.render.renderer import _tile_swizzle

    cam = Camera(look_at=(0.0, 0.0, 3.0), distance=6.0)
    grid = pixel_grid(512, 512).reshape(-1, 2)
    sw, _ = _tile_swizzle(512, 512)     # renderer's coherent tile order
    o, d = cam.generate_rays(grid[sw])
    tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)

    f = jax.jit(lambda o, d, t, a, tl, p: pallas_cluster_tris(o, d, t, a,
                                                              tl, p))
    r = f(o, d, tmax, aabbs, tiles, perm)
    np.asarray(r[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        r = f(o, d, tmax, aabbs, tiles, perm)
    np.asarray(r[0])
    dt = (time.perf_counter() - t0) / reps
    hit = float(np.isfinite(np.asarray(r[0])).mean())
    print(json.dumps({
        "metric": "scale_closest_hit_rays_per_s",
        "tris": int(T.shape[0]),
        "clusters": int(perm.shape[0]),
        "hbm_streamed": bool(tiles.shape[2] != 16),
        "cluster_build_ms": round(build_ms, 1),
        "value": round(o.shape[0] / dt),
        "unit": "rays/s",
        "hit_fraction": round(hit, 3),
    }))


if __name__ == "__main__":
    main()
