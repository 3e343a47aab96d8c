"""Quick sweep_stats measurement on the real chip (bench.py's accounting)."""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from bench import sweep_stats
from cge_tpu import Camera, SceneType, load_scene_prebuilt

scene = load_scene_prebuilt(SceneType.Teapot)
s = sweep_stats(scene, Camera())
print({k: round(v, 4) if isinstance(v, float) else v for k, v in s.items()},
      flush=True)
