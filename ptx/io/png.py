"""PNG codec.

The reference wraps libpng with 16→8-bit stripping, palette expansion, and
opaque-alpha filling (``/root/reference/src/png_decoder.cpp:85-97``,
output RGBA8).  Here the same normalization sits on top of either Pillow
(fast path, when importable) or a self-contained pure-Python decoder
(stdlib ``zlib`` + numpy unfiltering) so the framework has no hard image
dependency.  The encoder is self-contained (filter 0 + zlib).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


class PNGError(ValueError):
    pass


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def read(path) -> np.ndarray:
    """Decode a PNG → uint8 (H, W, 4) RGBA (16-bit stripped, palette
    expanded, alpha filled opaque — png_decoder.cpp:85-97)."""
    try:
        from PIL import Image as _PILImage
        with _PILImage.open(path) as im:
            return np.asarray(im.convert("RGBA"), np.uint8)
    except ImportError:
        pass
    with open(path, "rb") as f:
        return decode(f.read())


def read_float(path) -> np.ndarray:
    """Decode to float32 RGBA in [0, 1] (image.cpp:66-71 divides by 255)."""
    return read(path).astype(np.float32) / 255.0


def decode(data: bytes) -> np.ndarray:
    if data[:8] != _MAGIC:
        raise PNGError("bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    trns = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(chunk, np.uint8)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise PNGError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise PNGError("unsupported compression/filter method")
    if interlace != 0:
        raise PNGError("interlaced PNG not supported by fallback decoder")

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))

    if depth in (8, 16):
        sample_bytes = depth // 8
        bpp = channels * sample_bytes
        stride = w * bpp
        img = _unfilter(raw, h, stride, bpp)
        arr = img.reshape(h, w, channels, sample_bytes)[..., 0]  # strip 16→8
    elif depth in (1, 2, 4):
        bits_per_row = w * channels * depth
        stride = (bits_per_row + 7) // 8
        img = _unfilter(raw, h, stride, 1)
        bits = np.unpackbits(img.reshape(h, -1), axis=1)
        vals = bits.reshape(h, -1, depth)
        weights = 1 << np.arange(depth - 1, -1, -1)
        arr = (vals * weights).sum(axis=2)[:, :w * channels]
        arr = arr.reshape(h, w, channels).astype(np.uint8)
        if color != 3:     # grayscale scale-up to 8-bit
            arr = (arr * (255 // ((1 << depth) - 1))).astype(np.uint8)
    else:
        raise PNGError(f"unsupported bit depth {depth}")

    if color == 3:
        if palette is None:
            raise PNGError("palette image without PLTE")
        idx = arr[..., 0]
        rgb = palette[idx]
        if trns is not None:
            a = np.full(len(palette), 255, np.uint8)
            a[:len(trns)] = trns
            alpha = a[idx]
        else:
            alpha = np.full_like(idx, 255)
        return np.dstack([rgb, alpha]).astype(np.uint8)
    if color == 0:
        g = arr[..., 0]
        return np.dstack([g, g, g, np.full_like(g, 255)])
    if color == 2:
        return np.dstack([arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)])
    if color == 4:
        g, a = arr[..., 0], arr[..., 1]
        return np.dstack([g, g, g, a])
    return arr   # color == 6


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    out = np.zeros((h, stride), np.uint8)
    raw = np.frombuffer(raw, np.uint8)
    if len(raw) < h * (stride + 1):
        raise PNGError("truncated IDAT")
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
        ftype = row[0]
        cur = row[1:].astype(np.int32)
        if ftype == 0:
            rec = cur
        elif ftype == 2:       # up
            rec = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise PNGError(f"bad filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def write(path, img: np.ndarray) -> None:
    """Encode uint8 (H, W, 1/3/4) or float (clipped ×255) to PNG."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    rows = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1)
    payload = zlib.compress(rows.tobytes(), 6)

    def chunk(tag, body):
        out = struct.pack(">I", len(body)) + tag + body
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return out + struct.pack(">I", crc)

    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)))
        f.write(chunk(b"IDAT", payload))
        f.write(chunk(b"IEND", b""))
