"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware, and keep numerics in f32.

Note: the image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so env vars set here are too late — we must go through
jax.config (the backend is not initialized until first use, so this works).

CGE_TPU_TESTS=1 keeps the real accelerator backend instead (axon/TPU): the
Pallas cluster-sweep render path then executes for real and the
TPU-gated goldens (teapot_accel_512, teapot_bench_512) stop skipping.
tools/tpu_goldens.py uses this to run the TPU parity set each round.
"""

import os

TPU_MODE = os.environ.get("CGE_TPU_TESTS", "") == "1"

if not TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
else:
    # compiles through the axon tunnel are slow; cache them across runs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_enable_x64", False)
