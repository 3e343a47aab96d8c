"""Image IO.

Loading mirrors the reference's stb_image-based ``Image``
(/root/reference/framework/src/image.cpp:22-34): forced RGB, u8 -> f32/255,
row-major with row 0 = top of the image.

Writing provides the stbi_write_bmp-compatible BMP output used by the CLI
(/root/reference/src/screen.cpp:49-60) plus PNG via PIL.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np


@dataclasses.dataclass
class Image:
    """framework/include/framework/image.h:11-18."""

    width: int
    height: int
    pixels: np.ndarray  # [H, W, 3] f32 in [0, 1], row 0 = top


def load_image(path: str) -> Image:
    from PIL import Image as PILImage

    with PILImage.open(path) as im:
        rgb = im.convert("RGB")
        arr = np.asarray(rgb, dtype=np.uint8).astype(np.float32) / 255.0
    h, w = arr.shape[:2]
    return Image(width=w, height=h, pixels=arr)


def to_u8(img_f32: np.ndarray) -> np.ndarray:
    """Clamp [0,1], scale by 255, truncate to u8 — matches the u8vec4 cast at
    screen.cpp:51-56 (C++ float->u8 conversion truncates). NaN radiance (the
    reference produces NaN via std::pow(negative, non-integral Ns) in its
    specular quirk, shading.cpp:31) maps to 0 — the result of x86
    cvttss2si(NaN) & 0xff, i.e. what the reference's UB cast produces."""
    clamped = np.clip(np.nan_to_num(np.asarray(img_f32, np.float32), nan=0.0),
                      0.0, 1.0)
    return (clamped * 255.0).astype(np.uint8)


def write_bmp(path: str, img_f32: np.ndarray) -> None:
    """Write a 24-bit BMP. img_f32: [H, W, 3], row 0 = top (the convention our
    renderer produces after the setPixel y-flip, screen.cpp:41-47)."""
    u8 = to_u8(img_f32)
    h, w = u8.shape[:2]
    row_stride = (w * 3 + 3) & ~3
    pad = row_stride - w * 3
    data_size = row_stride * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + data_size, 0, 0, 54,
        40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(header)
        padding = b"\x00" * pad
        # BMP rows are bottom-up; our row 0 is top.
        bgr = u8[::-1, :, ::-1]
        for row in bgr:
            f.write(row.tobytes())
            if pad:
                f.write(padding)


def write_png(path: str, img_f32: np.ndarray) -> None:
    from PIL import Image as PILImage

    PILImage.fromarray(to_u8(img_f32), mode="RGB").save(path)


def read_bmp(path: str) -> np.ndarray:
    """Read a BMP back as [H, W, 3] f32 (row 0 = top) — for golden tests."""
    from PIL import Image as PILImage

    with PILImage.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return arr.astype(np.float32) / 255.0
