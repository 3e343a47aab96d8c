"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding tests work without TPU hardware, and keep numerics in f32.

Note: the image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so env vars set here are too late — we must go through
jax.config (the backend is not initialized until first use, so this works).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
