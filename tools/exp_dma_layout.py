"""Round-5 experiment: can the HBM cluster-tile stack stay COMPACT?

The r4 HBM layout lane-pads each triangle's 16 packed fields to 128
(cluster_sweep.py pack_cluster_tiles), so every supercluster DMA moves 8x
the useful bytes (VERDICT r4 weak #1). This measures, on the real chip:

  A) [N, C, 128] padded rows  -> VMEM (2, sc_n, C, 128)   (the r4 layout)
  B) [N, C, 16]  compact rows -> VMEM (2, sc_n, C, 16)    (the candidate)
  C) [N, 16, 128] compact, flat-reinterpreted rows        (fallback shape)

Each variant streams the whole stack through a double-buffered DMA loop and
reduces it, so the measured time is DMA-bound. Compile failure of B tells
us Mosaic rejects sub-128 minor dims for ANY->VMEM copies.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SC_N = 4
C = 128


def make_kernel(w, sub):
    def kernel(hbm_ref, out_ref, buf_ref, sem_ref):
        n = hbm_ref.shape[0] // SC_N

        def get(slot, step):
            return pltpu.make_async_copy(
                hbm_ref.at[pl.ds(step * SC_N, SC_N)], buf_ref.at[slot],
                sem_ref.at[slot])

        get(0, 0).start()

        def body(step, acc):
            slot = jax.lax.rem(step, 2)
            get(slot, step).wait()

            @pl.when(step + 1 < n)
            def _():
                get(jax.lax.rem(step + 1, 2), step + 1).start()

            return acc + jnp.sum(buf_ref[slot], axis=(0, 1))

        acc = jax.lax.fori_loop(0, n, body, jnp.zeros((w,), jnp.float32))
        out_ref[0, :] = acc

    def run(stack):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, w), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, SC_N, sub, w), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )(stack)

    return jax.jit(run)


def bench(f, x, n1=5, n2=25):
    np.asarray(f(x))
    t0 = time.perf_counter()
    for _ in range(n1):
        r = f(x)
    np.asarray(r)
    t1 = time.perf_counter()
    for _ in range(n2):
        r = f(x)
    np.asarray(r)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3


def main():
    L = 4800  # clusters: 614k tris / 128 -> dragon scale
    key = jax.random.PRNGKey(0)
    compact = jax.random.normal(key, (L, C, 16), jnp.float32)
    padded = jnp.pad(compact, ((0, 0), (0, 0), (0, 112)))
    flat = compact.reshape(L, 16, 128)

    for name, stack, w, sub in [
        ("A padded  [L,C,128]", padded, 128, C),
        ("B compact [L,C,16] ", compact, 16, C),
        ("C flat    [L,16,128]", flat, 128, 16),
    ]:
        try:
            f = make_kernel(w, sub)
            ms = bench(f, stack)
            gb = stack.size * 4 / 1e9
            print(f"{name}: {ms:8.3f} ms  {gb / (ms / 1e3):7.1f} GB/s "
                  f"({gb * 1e3:.1f} MB streamed)")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
