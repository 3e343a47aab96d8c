"""Measure the MXU dense-tile variant of the cluster sweep (round 4).

Kernel level: parity + slope-timed ms for {vpu, mxu} x {exact, frustum
keys} x {closest, any_hit} on production-shaped rays (teapot-512, 32x16
swizzled, shared-origin primaries + divergent bounce-like rays).
Render level: teapot-512 u8 frame with the winning kernel config and a
trace_chunk sweep.

Usage: PYTHONPATH=. python tools/tune_mxu.py [kernel|render]
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import device_ms
from cge_tpu import Camera, SceneType, load_scene_prebuilt
from cge_tpu.camera import pixel_grid
from cge_tpu.ops.intersect import build_accel
from cge_tpu.ops.pallas.cluster_sweep import pallas_cluster_tris
from cge_tpu.render.renderer import _swizzle_rows

W = H = 512
scene = load_scene_prebuilt(SceneType.Teapot)
cam = Camera()
grid = _swizzle_rows(pixel_grid(W, H).reshape(-1, 2), W, H)
o, d = cam.generate_rays(grid)
tmax = jnp.full(o.shape[0], jnp.inf, jnp.float32)
accel = jax.jit(build_accel)(scene)
jig = jnp.float32(1e-7)


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[0:1]


def kernel_grid():
    # reference result for parity: vpu, exact keys
    base = jax.jit(lambda o, d, t: pallas_cluster_tris(
        o, d, t, accel.aabbs, accel.tiles, accel.perm))
    t0, i0 = base(o, d, tmax)
    t0, i0 = np.asarray(t0), np.asarray(i0)
    hit0 = np.isfinite(t0)

    for mxu in (False, True):
        for exact in (True, False):
            for shared in (False, True):
                f = jax.jit(lambda o, d, t, m=mxu, e=exact, s=shared:
                            pallas_cluster_tris(
                                o, d, t, accel.aabbs, accel.tiles,
                                accel.perm, mxu=m, exact_keys=e,
                                shared_origin=s))
                t1, i1 = f(o, d, tmax)
                t1, i1 = np.asarray(t1), np.asarray(i1)
                hit1 = np.isfinite(t1)
                hit_match = (hit0 == hit1).mean()
                both = hit0 & hit1
                terr = np.abs(t1[both] - t0[both]).max() if both.any() else 0
                idm = (i0[both] == i1[both]).mean() if both.any() else 1
                ms = device_ms(lambda i, f=f: f(o + jig * i, d, tmax)[0],
                               n1=10, n2=30)
                print(f"closest mxu={int(mxu)} exact={int(exact)} "
                      f"shared={int(shared)}: {ms:.3f} ms  "
                      f"hit_match={hit_match:.6f} max_terr={terr:.2e} "
                      f"id_match={idm:.6f}", flush=True)

    # any-hit: shadow-like budgeted rays toward the light from hit points
    lp = jnp.asarray(scene.point_pos[0])
    dhat = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tn = jnp.where(hit0, t0, 0.0) * jnp.linalg.norm(d, axis=-1)
    p = o + dhat * (tn - 1e-5)[:, None]
    sdir = lp[None, :] - p
    stm = jnp.where(hit0, 1.0, -1.0)
    ah0 = None
    for mxu in (False, True):
        for exact in (True, False):
            f = jax.jit(lambda o, d, t, m=mxu, e=exact:
                        pallas_cluster_tris(
                            o, d, t, accel.aabbs, accel.tiles, accel.perm,
                            any_hit=True, mxu=m, exact_keys=e))
            h1 = np.asarray(f(p, sdir, stm)[0])
            if ah0 is None:
                ah0 = h1
            ms = device_ms(lambda i, f=f: f(p + jig * i, sdir, stm)[0],
                           n1=10, n2=30)
            print(f"any_hit mxu={int(mxu)} exact={int(exact)}: {ms:.3f} ms  "
                  f"match={(h1 == ah0).mean():.6f}", flush=True)


def render_grid():
    from cge_tpu import Features, RenderParams, render_image_u8
    feats = Features(enable_shading=True, enable_hard_shadow=True,
                     enable_recursive=True, enable_normal_interp=True,
                     enable_accel_structure=True)
    ref = None
    for tc in (65536, 32768, 16384):
        params = RenderParams(trace_chunk=tc)
        img = np.asarray(render_image_u8(scene, cam, feats, params, W, H))
        if ref is None:
            ref = img
        ms = device_ms(lambda s, p=params: render_image_u8(
            scene, cam, feats, p, W, H, s))
        print(f"trace_chunk={tc}: u8 {ms:.2f} ms "
              f"identical={(img == ref).mean():.5f}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    if which in ("kernel", "all"):
        kernel_grid()
    if which in ("render", "all"):
        render_grid()
