"""Unified image loading — the reference's ``Image(fileName)`` constructor
dispatches on extension (``/root/reference/src/image.cpp:49-83``): ``.png``
via its libpng wrapper (→ float RGBA ÷255), ``.hdr``/``.pic`` via its RGBE
reader.  Arrays here are float32 (H, W, 4) RGBA — the refcounted C++
``Image`` container (image.h:84-98) has no array-world equivalent to build;
numpy ownership semantics replace it."""

from __future__ import annotations

import os

import numpy as np

from ptx.io import bmp, hdr, png


def load(path) -> np.ndarray:
    ext = os.path.splitext(str(path))[1].lower().lstrip(".")
    if ext == "png":
        return png.read_float(path)
    if ext in ("hdr", "pic"):
        return hdr.read(path)
    if ext == "bmp":
        rgb = bmp.read(path).astype(np.float32) / 255.0
        return np.concatenate([rgb, np.ones_like(rgb[..., :1])], axis=-1)
    raise ValueError(f"invalid format: {path}")


def save(path, img) -> None:
    img = np.asarray(img)
    ext = os.path.splitext(str(path))[1].lower().lstrip(".")
    if ext == "png":
        png.write(path, img if img.dtype == np.uint8
                  else np.clip(img, 0.0, 1.0))
    elif ext in ("hdr", "pic"):
        hdr.write(path, img)
    elif ext == "bmp":
        bmp.write(path, img)
    else:
        raise ValueError(f"invalid format: {path}")
