#!/usr/bin/env python
"""Large real-asset end-to-end benchmark: the Dragon scene, actually run.

The reference names dragon.obj 1024x1024 as a validation config
(src/scene.cpp:70-73, BASELINE.json `configs`) but does not ship the asset.
This harness closes the gap with a genuine 600k-triangle OBJ *file* (see
tools/make_large_asset.py): it exercises the full production path the
synthetic bench_scale.py skips —

  1. OBJ text parse at scale through BOTH loaders (pure-Python mesh_io and
     the native C++ host runtime), cross-checked;
  2. scene assembly with the Dragon scene's normalization + point light
     (scene.cpp:70-73);
  3. cluster build (native fast path) + HBM-resident tile packing;
  4. a full-feature 1024x1024 render (Phong, hard shadows, recursive,
     normal interpolation, accel) through render_image — trace_chunk,
     tile swizzle, shared-origin sweep, the lot.

Prints one BENCH-style JSON line. Usage:
  PYTHONPATH=. python tools/bench_large.py [width] [rings] [segments]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_large_asset import ensure_asset  # noqa: E402


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rings = int(sys.argv[2]) if len(sys.argv) > 2 else 801
    segments = int(sys.argv[3]) if len(sys.argv) > 3 else 384

    obj = os.path.join(REPO, "data", "dragon_standin.obj")
    gen = ensure_asset(obj, rings, segments)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from cge_tpu import Camera, Features, RenderParams
    from cge_tpu.native import load_obj_native
    from cge_tpu.render.renderer import render_image
    from cge_tpu.scene.mesh_io import load_mesh
    from cge_tpu.scene.scene import PointLight, build_scene_arrays
    from cge_tpu.utils.profiling import count_rays

    # 1. both loaders, timed; cross-checked
    t0 = time.perf_counter()
    subs = load_mesh(obj, center_and_normalize=True)   # Dragon normalizes
    py_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    nat = load_obj_native(obj, True)
    nat_ms = (time.perf_counter() - t0) * 1e3
    n_tris = sum(int(s.triangles.shape[0]) for s in subs)
    assert nat is not None and len(nat) == len(subs)
    for s, (pos, nrm, uv, tris, mat) in zip(subs, nat):
        assert pos.shape == s.positions.shape
        assert np.array_equal(tris, s.triangles.astype(np.uint32))
        assert np.allclose(pos, s.positions, atol=1e-5)

    # 2. Dragon scene wiring: normalized mesh + white point light
    scene = build_scene_arrays(
        subs, (), [PointLight(position=(-1.0, 1.0, -1.0),
                              color=(1.0, 1.0, 1.0))])

    # 3+4. full production render path (accel built inside, native cluster
    # fast path, HBM tiles at this triangle count)
    cam = Camera(look_at=(0.0, 0.0, 0.0), distance=3.2)
    feats = Features(enable_shading=True, enable_hard_shadow=True,
                     enable_recursive=True, enable_normal_interp=True,
                     enable_accel_structure=True)
    params = RenderParams()

    t0 = time.perf_counter()
    img = np.asarray(render_image(scene, cam, feats, params, W, W))
    first_ms = (time.perf_counter() - t0) * 1e3   # incl. compile + build

    def run(s):
        return render_image(scene, cam, feats, params, W, W, seed=s)

    from bench import device_ms
    ms = device_ms(run, n1=2, n2=6, trials=3)

    rays = count_rays(W, W, scene, feats, params)
    hit_frac = float((img.sum(axis=-1) > 0).mean())
    print(json.dumps({
        "metric": f"dragon{W}_rays_per_s",
        "value": round(rays / (ms / 1e3)),
        "unit": "rays/s",
        "mrays_per_s": round(rays / ms / 1e3, 2),
        "triangles": n_tris,
        "obj_bytes": gen.get("bytes"),
        "py_load_ms": round(py_ms),
        "native_load_ms": round(nat_ms),
        "render_ms": round(ms, 1),
        "first_render_ms": round(first_ms),
        "hit_fraction": round(hit_frac, 3),
    }))


if __name__ == "__main__":
    main()
