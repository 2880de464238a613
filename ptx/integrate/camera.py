"""Pinhole camera / pixel-ray generation.

Mirrors the reference ``tracePixel`` mapping (path-trace.h:172-201): the
camera sits at the origin looking down −z at a screen of world size
``(screen_width, screen_height)`` at ``screen_distance``; pixel ``(px,py)``
maps to NDC ``x = 2(px+jx)/W − 1``, ``y = 1 − 2(py+jy)/H`` with per-sample
in-pixel jitter for anti-aliasing.  An optional pose affine re-seats the
camera anywhere (applied to origins affinely, directions linearly).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ptx.core import linalg, rng
from ptx.core.constants import (DEFAULT_SCREEN_DISTANCE,
                                DEFAULT_SCREEN_HEIGHT, DEFAULT_SCREEN_WIDTH)


@dataclasses.dataclass(frozen=True)
class Camera:
    width: int
    height: int
    screen_width: float = DEFAULT_SCREEN_WIDTH
    screen_height: float = DEFAULT_SCREEN_HEIGHT
    screen_distance: float = DEFAULT_SCREEN_DISTANCE
    pose: Any = None            # optional (3, 4) camera-to-world affine

    @staticmethod
    def reference_demo(width: int, height: int) -> "Camera":
        """The demo driver's parameterization (test.cpp:450): screen size =
        pixel dimensions, distance = 2·min(W, H)."""
        return Camera(width, height, float(width), float(height),
                      2.0 * min(width, height))


def pixel_rays(cam: Camera, px, py, jitter=None):
    """Rays for pixel coordinates ``px, py`` (any matching shape).

    ``jitter``: optional (..., 2) in-pixel offsets in [0, 1); ``None``
    traces pixel corners exactly like the float overload
    (path-trace.h:172-185).
    """
    px = jnp.asarray(px, jnp.float32)
    py = jnp.asarray(py, jnp.float32)
    if jitter is not None:
        px = px + jitter[..., 0]
        py = py + jitter[..., 1]
    x = 2.0 * px / cam.width - 1.0
    y = 1.0 - 2.0 * py / cam.height
    direction = jnp.stack([
        x * cam.screen_width,
        y * cam.screen_height,
        jnp.full_like(x, -cam.screen_distance),
    ], axis=-1)
    origin = jnp.zeros_like(direction)
    if cam.pose is not None:
        origin, direction = linalg.transform_ray(
            jnp.asarray(cam.pose, jnp.float32), origin, direction)
    return origin, direction


def sample_rays(cam: Camera, key, ys, xs, spp: int):
    """Jittered rays for a pixel grid: returns (origin, dir) of shape
    ``(spp, len(ys), len(xs), 3)``."""
    py, px = jnp.meshgrid(jnp.asarray(ys, jnp.float32),
                          jnp.asarray(xs, jnp.float32), indexing="ij")
    shape = (spp,) + py.shape
    jitter = rng.sample_square(key, shape)
    return pixel_rays(cam, jnp.broadcast_to(px, shape),
                      jnp.broadcast_to(py, shape), jitter)
