"""Dead-lane compaction (ptx.integrate.trace._compact_wavefront): the
phase-compacted wavefront must agree with the full-width wavefront in
expectation (it reroutes which stochastic path each ray takes, never the
estimator), stay deterministic, and remain unbiased under forced
resampling overflow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.integrate import trace as tr
from ptx.integrate.camera import Camera, sample_rays
from ptx.scenes.builders import make_world


@pytest.fixture(scope="module")
def setup():
    scene = tr.compile_scene(make_world())
    cam = Camera.reference_demo(128, 128)
    key = jax.random.PRNGKey(5)
    o, d = sample_rays(cam, key, jnp.arange(128), jnp.arange(128), 2)
    return scene, o.reshape(-1, 3), d.reshape(-1, 3), key


def _mean_radiance(scene, o, d, key, compact, depth=8, fold=0):
    from ptx.core import rng
    r = tr.trace_rays(scene, scene.params, o, d, rng.fold(key, fold),
                      depth=depth, compact=compact)
    return r


def test_compaction_auto_enables_and_matches_expectation(setup):
    scene, o, d, key = setup
    assert o.shape[0] == 128 * 128 * 2 >= tr._COMPACT_MIN_BATCH
    f = jax.jit(lambda c, i: jnp.mean(
        _mean_radiance(scene, o, d, key, c, fold=i), axis=(0,)),
        static_argnums=0)
    # average over several keys: compaction changes each ray's path, so
    # agreement is statistical — means over 32k rays at ~4 keys
    on = np.mean([np.asarray(f(True, i)) for i in range(4)], axis=0)
    off = np.mean([np.asarray(f(False, i)) for i in range(4)], axis=0)
    np.testing.assert_allclose(on, off, rtol=0.02)


def test_compaction_deterministic(setup):
    scene, o, d, key = setup
    f = jax.jit(lambda: _mean_radiance(scene, o, d, key, True))
    a, b = np.asarray(f()), np.asarray(f())
    np.testing.assert_array_equal(a, b)


def test_compaction_overflow_resampling_unbiased(setup, monkeypatch):
    """Tiny caps force systematic-resampling overflow on every phase; the
    mean must survive (throughput reweighting by n/cap)."""
    scene, o, d, key = setup
    monkeypatch.setattr(tr, "_COMPACT_SCHEDULE", ((1, 4), (3, 16)))
    f = jax.jit(lambda c, i: jnp.mean(
        _mean_radiance(scene, o, d, key, c, fold=i)), static_argnums=0)
    on = np.mean([float(f(True, i)) for i in range(6)])
    off = np.mean([float(f(False, i)) for i in range(6)])
    assert on == pytest.approx(off, rel=0.04)


def test_resampling_offset_varies_kept_subset():
    """Overflow resampling must randomize its phase.  Without the random
    offset the evenly-spaced keep pattern is a deterministic function of
    the alive mask — the SAME lanes lose their post-compaction light in
    every sample/chunk, which showed up as 2-pixel-period bright/dark
    stripes through the demo lens (parity block (560, 524)): per-pixel
    bias with an exactly-correct block mean."""
    B, cap, T = 1024, 128, 24
    alive = (jnp.arange(B) % 2) == 0               # 512 alive > cap
    d0 = jnp.zeros((B, 3)).at[:, 2].set(-1.0)
    carry = (jnp.zeros((B, 3)), d0, jnp.ones((B, 3)), jnp.ones(B), alive)
    orig = jnp.arange(B, dtype=jnp.int32)
    counts = np.zeros(B)
    for s in range(T):
        _, new_orig = tr._compact_wavefront(
            carry, orig, cap, key=jax.random.PRNGKey(s))
        kept = np.asarray(new_orig)
        kept = kept[kept < B]
        assert len(kept) == cap
        counts[kept] += 1
    alive_np = np.asarray(alive)
    assert counts[~alive_np].sum() == 0            # only alive lanes kept
    # deterministic phase ⇒ counts ∈ {0, T}; randomized ⇒ spread near
    # the per-lane expectation T·cap/n = 6
    assert (counts == T).sum() == 0
    assert abs(counts[alive_np].mean() - T * cap / 512) < 1.0


def test_compaction_finite_gradients(setup):
    scene, o, d, key = setup

    def loss(params):
        r = tr.trace_rays(scene, params, o, d, key, depth=8, compact=True)
        return jnp.mean(r)

    g = jax.jit(jax.grad(loss))(scene.params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(g["sphere_radius"])).max() > 0
