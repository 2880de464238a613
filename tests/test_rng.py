"""RNG: reference-LCG bit-exactness and sampler distributions."""

import numpy as np
import jax
import jax.numpy as jnp

from ptx.core import rng


def _lcg_bigint(seed, count):
    """Independent big-int re-derivation of the reference stream
    (path-trace.h:36-44): v = (214013·v + 2531011) mod 2^64, output = high
    32 bits, seed XOR 0x12476242."""
    v = (seed ^ 0x12476242) & 0xFFFFFFFFFFFFFFFF
    out = []
    for _ in range(count):
        v = (214013 * v + 2531011) & 0xFFFFFFFFFFFFFFFF
        out.append(v >> 32)
    return out


def test_reference_lcg_stream_matches_bigint():
    for seed in (0, 1, 0xDEADBEEF):
        eng = rng.ReferenceLCG(seed)
        want = _lcg_bigint(seed, 64)
        got = [eng() for _ in range(64)]
        assert got == want
        np.testing.assert_array_equal(
            rng.lcg_stream(seed, 64), np.array(want, np.uint32))


def test_reference_lcg_discard():
    a = rng.ReferenceLCG(7)
    b = rng.ReferenceLCG(7)
    a.discard(10)
    for _ in range(10):
        b()
    assert a() == b()


def test_reference_lcg_uniform_range():
    eng = rng.ReferenceLCG(3)
    vals = [eng.uniform(-1.0, 1.0) for _ in range(200)]
    assert all(-1.0 <= v <= 1.0 for v in vals)
    assert abs(np.mean(vals)) < 0.2


def test_unit_ball_distribution():
    """Uniform-in-ball: |v| ≤ 1, E[v]=0, E[|v|²]=3/5."""
    key = jax.random.PRNGKey(0)
    v = np.asarray(rng.sample_unit_ball(key, (20000,)))
    r = np.linalg.norm(v, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(v.mean(axis=0), 0.0, atol=0.02)
    np.testing.assert_allclose((r ** 2).mean(), 0.6, atol=0.02)
    # radius^3 uniform in [0,1]
    np.testing.assert_allclose(np.sort(r ** 3)[10000], 0.5, atol=0.03)


def test_fold_decorrelates():
    key = jax.random.PRNGKey(1)
    a = np.asarray(jax.random.uniform(rng.fold(key, 0), (100,)))
    b = np.asarray(jax.random.uniform(rng.fold(key, 1), (100,)))
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.3
    assert not np.array_equal(a, b)
