"""Golden-image regression: fixed-seed renders of the baseline scenes must
stay statistically stable.  The comparison is tolerant to Monte-Carlo /
compiler drift (per-pixel agreement at 32 spp) but catches semantic
regressions (shading, CSG, camera, RNG-keying changes show up as gross
shifts).  Regenerate deliberately with tests/make_goldens.py."""

import os

import numpy as np
import jax
import pytest

from ptx.integrate.camera import Camera
from ptx.integrate.render import render
from ptx.integrate.trace import compile_scene
from ptx.scenes import builders

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CONFIGS = {
    "config1": builders.baseline_config1,
    "config2": builders.baseline_config2,
    "config3": builders.baseline_config3,
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip("golden not generated")
    want = np.load(path)["img"]
    scene = compile_scene(CONFIGS[name]())
    cam = Camera(32, 24)
    got = np.asarray(render(scene, cam, jax.random.PRNGKey(0),
                            spp=32, depth=6))
    assert got.shape == want.shape
    # mean image agreement and per-pixel agreement within MC noise
    assert abs(got.mean() - want.mean()) < 0.02 * max(want.mean(), 0.05)
    diff = np.abs(got - want).mean()
    assert diff < 0.06, f"golden drift: mean abs diff {diff:.4f}"
