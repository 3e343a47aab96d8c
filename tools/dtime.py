"""Slope-based device timing through the axon tunnel.

A single timed batch pays a large, variable host<->tunnel round-trip on the
final sync, so wall/reps at small reps measures the tunnel, not the device.
device_ms(f, *args) dispatches N1 and N2 calls back-to-back (async, one sync
each) and returns the slope (T2 - T1) / (N2 - N1) — the fixed cost cancels.
"""
import time

import numpy as np
import jax


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0:1]


def device_ms(f, *args, n1=20, n2=60, trials=3):
    _sync(f(*args))                       # compile + warm
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(n1):
            r = f(*args)
        _sync(r)
        t1 = time.perf_counter()
        for _ in range(n2):
            r = f(*args)
        _sync(r)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best * 1e3
