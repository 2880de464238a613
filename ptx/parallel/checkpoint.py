"""Checkpoint / resume for long renders and optimization runs.

The reference has none — its closest analogue is the per-block
``validBuffer`` pixel memo and the 1 Hz partial-pixel TCP stream
(``/root/reference/src/test.cpp:375-391,441-449``); a dropped connection
loses progress.  Here progress is durable and idempotent:

- **Renders** accumulate per-pixel *sample sums + counts* (not averages) to
  an ``.npz``; resuming continues at the next sample index, and merging
  shards from different hosts is addition.  Any tile/sample subset can be
  re-rendered without double counting by keying on the sample range.
- **Optimization runs** store the params pytree + step + RNG key.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


class RenderAccumulator:
    """Sample-sum image accumulator with durable save/resume."""

    def __init__(self, height: int, width: int, path: str | None = None):
        self.path = path
        self.sum = np.zeros((height, width, 3), np.float64)
        self.count = np.zeros((height, width), np.int64)
        if path and os.path.exists(path):
            with np.load(path) as z:
                self.sum = z["sum"]
                self.count = z["count"]

    @property
    def samples_done(self) -> int:
        return int(self.count.min())

    def add(self, image, spp: int, y0: int = 0) -> None:
        """Merge a mean image of ``spp`` samples covering rows
        ``y0:y0+image.shape[0]``."""
        img = np.asarray(image, np.float64)
        h = img.shape[0]
        self.sum[y0:y0 + h] += img * spp
        self.count[y0:y0 + h] += spp

    def image(self) -> np.ndarray:
        c = np.maximum(self.count, 1)[..., None]
        return (self.sum / c).astype(np.float32)

    def save(self, path: str | None = None) -> None:
        path = path or self.path
        if path is None:
            raise ValueError("no checkpoint path configured")
        tmp = path + ".tmp"
        np.savez_compressed(tmp, sum=self.sum, count=self.count)
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def save_params(path: str, params, step: int, key) -> None:
    flat, treedef = jax.tree.flatten(params)
    np.savez_compressed(
        path + ".tmp.npz",
        step=step, key=np.asarray(key),
        n_leaves=len(flat),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})
    os.replace(path + ".tmp.npz", path)


def load_params(path: str, params_template):
    _, treedef = jax.tree.flatten(params_template)
    with np.load(path) as z:
        n = int(z["n_leaves"])
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
        step = int(z["step"])
        key = jnp.asarray(z["key"])
    return jax.tree.unflatten(treedef, leaves), step, key
