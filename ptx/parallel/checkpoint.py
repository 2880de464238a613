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


class AdaptiveCheckpoint:
    """Durable state for the adaptive sampler: per-pixel sample moments
    (Σx, Σx², count) + completed-round counter.  Resuming re-enters
    ptx.integrate.adaptive.render_adaptive via its ``state`` argument;
    the refinement sequence is deterministic in (state, key), so an
    interrupted-and-resumed render equals the uninterrupted one
    (tests/test_scenes.py::test_adaptive_checkpoint_resume)."""

    def __init__(self, height: int, width: int, path: str | None = None):
        self.path = path
        self.s1 = np.zeros((height, width, 3), np.float32)
        self.s2 = np.zeros((height, width, 3), np.float32)
        self.count = np.zeros((height, width), np.float32)
        self.rounds_done = -1          # -1 = no base pass yet
        if path and os.path.exists(path):
            with np.load(path) as z:
                self.s1 = z["s1"]
                self.s2 = z["s2"]
                self.count = z["count"]
                self.rounds_done = int(z["rounds_done"])

    @property
    def state(self):
        """``state`` tuple for render_adaptive, or None if fresh."""
        if self.rounds_done < 0:
            return None
        return (self.s1, self.s2, self.count, self.rounds_done)

    def update(self, s1, s2, count, rounds_done: int) -> None:
        self.s1 = np.asarray(s1, np.float32)
        self.s2 = np.asarray(s2, np.float32)
        self.count = np.asarray(count, np.float32)
        self.rounds_done = int(rounds_done)
        if self.path:
            tmp = self.path + ".tmp.npz"
            np.savez_compressed(tmp, s1=self.s1, s2=self.s2,
                                count=self.count,
                                rounds_done=self.rounds_done)
            os.replace(tmp, self.path)


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
