"""Minimal BMP writer — the reference saves its tonemapped frame via
``SDL_SaveBMP`` (``/root/reference/src/test.cpp:1052-1060``); this is the
dependency-free equivalent (24-bit BI_RGB, bottom-up rows)."""

from __future__ import annotations

import struct

import numpy as np


def write(path, img: np.ndarray) -> None:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        # reference tone map: clamp ×256 to 8-bit (test.cpp:993-995)
        img = np.clip(img * 256.0, 0.0, 255.0).astype(np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    h, w = img.shape[:2]
    bgr = img[..., :3][..., ::-1]
    pad = (4 - (w * 3) % 4) % 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        rows += bgr[y].tobytes() + b"\x00" * pad
    pixel_bytes = len(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes,
                       2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(header + info + bytes(rows))


def read(path) -> np.ndarray:
    """Read a 24/32-bit uncompressed BMP → uint8 (H, W, 3)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (offset,) = struct.unpack_from("<I", data, 10)
    size, w, h = struct.unpack_from("<Iii", data, 14)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError("unsupported BMP variant")
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    flip = h > 0
    h = abs(h)
    out = np.empty((h, w, 3), np.uint8)
    for i in range(h):
        y = h - 1 - i if flip else i
        row = np.frombuffer(data, np.uint8, count=w * nb,
                            offset=offset + i * stride).reshape(w, nb)
        out[y] = row[:, 2::-1][:, :3] if nb == 3 else row[:, [2, 1, 0]]
    return out
