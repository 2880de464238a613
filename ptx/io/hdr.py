"""Radiance ``.hdr`` (RGBE) codec.

A from-scratch implementation of the reference's hand-rolled reader/writer
(``/root/reference/src/image.cpp:83-324`` read, ``:398-481`` write):

- header: ``#?RADIANCE`` magic; ``FORMAT=32-bit_rle_rgbe`` required;
  ``EXPOSURE`` divides the decode scale; ``COLORCORR`` divides per channel;
  resolution string ``-Y h +X w`` only (top-down rows).
- scanlines: new-style per-component RLE (2,2,hi,lo introducer); old-style
  packed RGBE with (1,1,1,count) run markers is decoded *correctly* here —
  the reference's legacy branch never re-reads inside its repeat loop and
  can misdecode (image.cpp:268-303, a known reference bug we do not
  replicate).
- RGBE↔float uses the reference's ``179·2^(e−8)`` mantissa scaling
  (image.cpp:306-314) and its shared-exponent ceil-log2 encode
  (image.cpp:414-428), so files round-trip bit-identically against
  reference-written assets.

A C++ fast path lives in ptx.runtime (same wire format); this module is the
portable fallback and the format oracle for tests.
"""

from __future__ import annotations

import io as _io

import numpy as np


class HDRError(ValueError):
    pass


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def read(path_or_bytes):
    """Read a Radiance HDR file → float32 (H, W, 4) RGBA (alpha = 1)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    buf = _io.BytesIO(data)

    if buf.read(11) != b"#?RADIANCE\n":
        raise HDRError("magic string doesn't match")

    scale = np.ones(3, np.float64)
    got_format = False
    while True:
        line = _read_line(buf)
        if line.startswith(b"#"):
            continue
        if line == b"":
            continue
        if line[:1] in (b"-", b"+"):
            res_line = line
            break
        if b"=" not in line:
            raise HDRError(f"unexpected header line {line!r}")
        key, _, val = line.partition(b"=")
        key = key.strip().decode()
        if key == "FORMAT":
            if got_format:
                raise HDRError("format already specified")
            got_format = True
            if val.strip() != b"32-bit_rle_rgbe":
                raise HDRError("invalid format specifier")
        elif key == "EXPOSURE":
            scale /= float(val)
        elif key == "COLORCORR":
            scale /= np.array([float(v) for v in val.split()], np.float64)
        # unknown variables ignored (image.cpp:172-181)

    parts = res_line.split()
    if len(parts) != 4 or parts[0] != b"-Y" or parts[2] != b"+X":
        raise HDRError("invalid resolution string")
    h, w = int(parts[1]), int(parts[3])
    if h <= 0 or w <= 0 or w >= 1 << 15:
        raise HDRError("invalid resolution string")

    # native fast path (ptx.runtime): same wire format, ~100x faster on
    # multi-megapixel probes
    try:
        from ptx.runtime import rgbe_decode, runtime_available
    except ImportError:
        runtime_available = lambda: False
    if runtime_available():
        pos = buf.tell()
        try:
            return rgbe_to_float(rgbe_decode(buf.read(), w, h), scale)
        except Exception:
            buf.seek(pos)         # fall through to the Python decoder

    rgbe = np.empty((h, w, 4), np.uint8)
    for y in range(h):
        intro = buf.read(4)
        if len(intro) < 4:
            raise HDRError("unexpected EOF")
        if intro[0] == 2 and intro[1] == 2 and not (intro[2] & 0x80):
            if (intro[2] << 8) + intro[3] != w:
                raise HDRError("invalid line length in new compressed line")
            for comp in range(4):
                x = 0
                row = rgbe[y, :, comp]
                while x < w:
                    b = buf.read(1)
                    if not b:
                        raise HDRError("unexpected EOF")
                    code = b[0]
                    if code > 0x80:                 # run
                        count = code - 0x80
                        v = buf.read(1)
                        if not v:
                            raise HDRError("unexpected EOF")
                        if x + count > w:
                            raise HDRError("line too long")
                        row[x:x + count] = v[0]
                        x += count
                    else:                            # literal
                        lit = buf.read(code)
                        if len(lit) < code:
                            raise HDRError("unexpected EOF")
                        if x + code > w:
                            raise HDRError("line too long")
                        row[x:x + code] = np.frombuffer(lit, np.uint8)
                        x += code
        else:
            # old-style: packed RGBE records; (1,1,1,n) repeats the previous
            # pixel n times (consecutive markers extend the count by 8-bit
            # shifts).  Implemented correctly — unlike the reference's dead
            # legacy branch (image.cpp:268-303).
            x = 0
            rshift = 0
            record = intro
            while True:
                if record[0] == 1 and record[1] == 1 and record[2] == 1:
                    if rshift >= 32:
                        raise HDRError("too many bytes in repeat count")
                    count = record[3] << rshift
                    if count == 0 or x == 0 or x + count > w:
                        raise HDRError("invalid repeat count")
                    rgbe[y, x:x + count] = rgbe[y, x - 1]
                    x += count
                    rshift += 8
                else:
                    rgbe[y, x] = np.frombuffer(record, np.uint8)
                    x += 1
                    rshift = 0
                if x >= w:
                    break
                record = buf.read(4)
                if len(record) < 4:
                    raise HDRError("unexpected EOF")

    return rgbe_to_float(rgbe, scale)


def _read_line(buf) -> bytes:
    out = bytearray()
    while True:
        c = buf.read(1)
        if not c:
            raise HDRError("unexpected EOF")
        if c == b"\n":
            return bytes(out)
        out += c


def rgbe_to_float(rgbe: np.ndarray, scale=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Vectorized RGBE→float: ``mantissa · 179 · 2^(e−128−8) · scale``
    (image.cpp:306-314)."""
    rgbe = np.asarray(rgbe, np.uint8)
    exp = rgbe[..., 3].astype(np.int32) - 128
    factor = 179.0 * np.exp2(exp - 8).astype(np.float64)
    out = np.empty(rgbe.shape[:-1] + (4,), np.float32)
    for c in range(3):
        out[..., c] = rgbe[..., c] * factor * np.asarray(scale)[c]
    out[..., 3] = 1.0
    return out


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def float_to_rgbe(img: np.ndarray) -> np.ndarray:
    """Shared-exponent encode (image.cpp:414-428), vectorized."""
    rgb = np.asarray(img, np.float64)[..., :3]
    maxv = rgb.max(axis=-1) / 179.0
    dark = maxv < 1e-30
    safe = np.where(dark, 1.0, maxv)
    lg = np.ceil(np.log2(safe) + 1e-5).astype(np.int32)
    scl = np.exp2(-(lg - 8)) / 179.0
    mant = np.clip(np.floor(rgb * scl[..., None]), 0, 255).astype(np.uint8)
    out = np.empty(rgb.shape[:-1] + (4,), np.uint8)
    out[..., :3] = np.where(dark[..., None], 0, mant)
    out[..., 3] = np.where(dark, 0, lg + 128).astype(np.uint8)
    return out


def write(path, img: np.ndarray) -> None:
    """Write float (H, W, 3/4) to a new-style-RLE HDR file
    (image.cpp:398-481)."""
    rgbe = float_to_rgbe(img)
    h, w = rgbe.shape[:2]
    out = bytearray()
    out += b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
    out += f"-Y {h} +X {w}\n".encode()
    try:
        from ptx.runtime import rgbe_encode, runtime_available
        native = runtime_available()
    except ImportError:
        native = False
    if native:
        out += rgbe_encode(rgbe)
    else:
        for y in range(h):
            out += bytes([2, 2, (w >> 8) & 0xFF, w & 0xFF])
            for comp in range(4):
                out += _rle_encode(rgbe[y, :, comp])
    with open(path, "wb") as f:
        f.write(bytes(out))


def _rle_encode(row: np.ndarray) -> bytes:
    """Per-component RLE: runs of ≥3 as (0x80+len, v), literals ≤0x80
    (image.cpp:430-471)."""
    out = bytearray()
    w = len(row)
    x = 0
    while x < w:
        # find next run of >= 3 within reach
        run_start = x
        while run_start < w:
            run_len = 1
            while (run_start + run_len < w and run_len < 0x7F
                   and row[run_start + run_len] == row[run_start]):
                run_len += 1
            if run_len >= 3:
                break
            run_start += run_len
        else:
            run_len = 0
        # emit literals up to run_start (chunks of <= 0x80)
        lit = run_start - x
        while lit > 0:
            n = min(lit, 0x80)
            out.append(n)
            out += row[x:x + n].tobytes()
            x += n
            lit -= n
        if run_start < w and run_len >= 3:
            out.append(0x80 + run_len)
            out.append(int(row[run_start]))
            x = run_start + run_len
    return bytes(out)
