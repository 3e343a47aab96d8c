"""Bloom post-filter.

Mirrors renderBloomFilter + weightsGaussian
(/root/reference/src/render.cpp:158-210):
  - luma threshold 0.2126/0.7152/0.0722; pixels strictly below the threshold
    are zeroed in the bright-pass copy;
  - 3x3 Gaussian sigma=1 built with the literal 3.1415 constant, normalized
    by its own sum;
  - the write loop skips the last screen row/column (y,x < resolution-1),
    which in buffer coordinates (row 0 = top after the setPixel y-flip,
    screen.cpp:41-47) leaves buffer row 0 and the last column untouched;
  - neighborhood reads are bounds-checked (zero-padding semantics);
  - debug option 0 = image + bloom, 1 = bloom only, 2 = original.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def weights_gaussian(sigma: float = 1.0) -> np.ndarray:
    w = np.empty((3, 3), np.float32)
    for i in range(-1, 2):
        for k in range(-1, 2):
            w[i + 1, k + 1] = np.exp(-(i * i + k * k) / (2 * sigma * sigma)) / (
                2 * 3.1415 * sigma * sigma)
    return (w / w.sum()).astype(np.float32)


def render_bloom_filter(buffer, params):
    """buffer: [H, W, 3] with row 0 = top. Returns filtered buffer."""
    H, W = buffer.shape[:2]
    luma = (0.2126 * buffer[..., 0] + 0.7152 * buffer[..., 1]
            + 0.0722 * buffer[..., 2])
    bright = jnp.where((luma < params.bloom_threshold)[..., None], 0.0, buffer)
    w = weights_gaussian(1.0)
    padded = jnp.pad(bright, ((1, 1), (1, 1), (0, 0)))
    blur = jnp.zeros_like(buffer)
    for dy in range(3):
        for dx in range(3):
            blur = blur + w[dy, dx] * padded[dy:dy + H, dx:dx + W]
    if params.bloom_debug_option == 1:
        new = blur * params.bloom_scalar
    elif params.bloom_debug_option == 2:
        new = buffer
    else:
        new = buffer + blur * params.bloom_scalar
    # region written: buffer rows 1..H-1, cols 0..W-2
    out = buffer
    out = out.at[1:, : W - 1].set(new[1:, : W - 1])
    return out
