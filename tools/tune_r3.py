"""Round-3 kernel tuner: sweep cluster_size x br x key mode on the real
teapot workload (closest + any-hit), with jittered inputs so the axon
tunnel cannot serve cached dispatches. Also reports visit counts so we can
compute honest dense-pair work per config."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import device_ms
from cge_tpu import Camera, SceneType, load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.ops.bvh import build_clusters
from cge_tpu.ops.pallas.cluster_sweep import (pack_cluster_tiles,
                                              pallas_cluster_tris)
from cge_tpu.render.renderer import _tile_swizzle

W = H = 512
scene = load_scene_prebuilt(SceneType.Teapot)
cam = Camera()
grid = pixel_grid(W, H).reshape(-1, 2)
sw, _ = _tile_swizzle(W, H)
o, d = cam.generate_rays(grid[sw])
o, d = jax.device_put(o), jax.device_put(d)
tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
jig = jnp.float32(1e-7)

ref_t = None
for cs in (32, 64, 128):
    perm = build_clusters(scene.vertices, scene.tris, scene.tri_mask,
                          cluster_size=cs)
    perm_j = jnp.asarray(perm)
    aabbs, tiles = jax.jit(lambda v: pack_cluster_tiles(
        v, scene.tris, perm_j))(scene.vertices)
    aabbs.block_until_ready()
    L, C, _ = tiles.shape
    for br in (256, 512, 1024):
        for exact in (True, False):
            f = jax.jit(lambda o, d, t: pallas_cluster_tris(
                o, d, t, aabbs, tiles, perm_j, br=br, exact_keys=exact,
                with_stats=True))
            r = f(o, d, tmax)
            t_out = np.asarray(r[0])
            visits = int(np.asarray(r[2], np.int64).sum())
            # each visit runs sc_n dense tiles: 1 on the VMEM-resident
            # layout, SUPERCLUSTER on the HBM/DMA layout (ADVICE r3)
            from cge_tpu.ops.pallas.cluster_sweep import SUPERCLUSTER
            sc_n = 1 if tiles.shape[2] == 16 else SUPERCLUSTER
            pairs = visits * sc_n * C * br
            if ref_t is None:
                ref_t = t_out
            ok = np.allclose(np.where(np.isfinite(t_out), t_out, -1),
                             np.where(np.isfinite(ref_t), ref_t, -1),
                             atol=1e-5)
            ms = device_ms(lambda i: f(o + jig * i, d, tmax), n1=4, n2=12)
            fa = jax.jit(lambda o, d, t: pallas_cluster_tris(
                o, d, t, aabbs, tiles, perm_j, br=br, exact_keys=exact,
                any_hit=True))
            ms_ah = device_ms(lambda i: fa(o + jig * i, d, tmax), n1=4, n2=12)
            gpairs_s = pairs / (ms / 1e3) / 1e9
            print(f"cs={cs:4d} br={br:5d} exact={int(exact)} "
                  f"closest={ms:6.2f}ms anyhit={ms_ah:6.2f}ms "
                  f"visits={visits:7d} pairs={pairs/1e6:8.1f}M "
                  f"({gpairs_s:6.1f} Gpair/s) match={ok}", flush=True)
