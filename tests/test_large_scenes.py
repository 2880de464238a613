"""Arbitrary-scale scenes (VERDICT round-1 missing #2): the candidate-
blocked first-hit must agree with the span-merge oracle and the dense
path at unionArray-style leaf counts the reference's streaming handles
(/root/reference/src/union.cpp:84-134, test.cpp:52-64)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.geom.fasthit import (collect_leaves, compile_fast_hit,
                              _DENSE_L_MAX)
from ptx.integrate.trace import compile_scene, first_hit, trace_rays
from ptx.scenes.builders import stress_spheres


def _rays(n, seed=0):
    g = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    d = np.stack([g.uniform(-1.5, 1.5, n), g.uniform(-0.8, 0.5, n),
                  np.full(n, -1.0)], -1).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _assert_hits_match(a, b, rtol=2e-5):
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    m = np.asarray(a["hit"])
    np.testing.assert_allclose(np.asarray(a["t"])[m], np.asarray(b["t"])[m],
                               rtol=rtol)
    np.testing.assert_array_equal(np.asarray(a["mat_id"])[m],
                                  np.asarray(b["mat_id"])[m])
    np.testing.assert_array_equal(np.asarray(a["entering"])[m],
                                  np.asarray(b["entering"])[m])
    # normals may differ by renormalization of already-unit vectors
    # (and fusion-order jitter in near-zero components)
    np.testing.assert_allclose(np.asarray(a["normal"])[m],
                               np.asarray(b["normal"])[m],
                               rtol=1e-4, atol=3e-4)


@pytest.mark.parametrize("n", [57, 121])
def test_blocked_hit_matches_spans_oracle(n):
    world = stress_spheres(n)
    scene = compile_scene(world, pallas=False)
    L = len(collect_leaves(scene.plan))
    assert L == n + 7
    # force the blocked strategy regardless of the dense-path cutover
    # (retuned to 64 in round 2) — this test is about the blocked scan
    hit_fn = (scene.hit_fn if L > _DENSE_L_MAX
              else compile_fast_hit(scene.plan, candidate_block=32))
    o, d = _rays(256)
    got = jax.jit(hit_fn)(scene.params, o, d)
    want = first_hit(scene.spans_fn(scene.params, o, d))
    assert int(np.asarray(got["hit"]).sum()) > 50
    _assert_hits_match(got, want)


def test_blocked_hit_matches_dense_path():
    """Force both strategies on the same mid-size scene."""
    world = stress_spheres(20)                 # L = 27, just over dense max
    scene = compile_scene(world, pallas=False)
    dense = compile_fast_hit(scene.plan, candidate_block=0)   # force dense
    blocked = compile_fast_hit(scene.plan, candidate_block=8)
    o, d = _rays(512, seed=1)
    a = jax.jit(blocked)(scene.params, o, d)
    b = jax.jit(dense)(scene.params, o, d)
    _assert_hits_match(a, b)
    np.testing.assert_array_equal(np.asarray(a["_evt"]),
                                  np.asarray(b["_evt"]))


def test_large_scene_renders_and_differentiates():
    """Full pipeline at L=64+: trace + manual-VJP gradients, finite."""
    world = stress_spheres(64)
    scene = compile_scene(world, pallas=False)
    o, d = _rays(128, seed=2)
    key = jax.random.PRNGKey(0)

    def loss(params):
        return jnp.mean(trace_rays(scene, params, o, d, key, depth=3))

    val, grads = jax.jit(jax.value_and_grad(loss))(scene.params)
    assert np.isfinite(float(val)) and float(val) > 0.01
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(grads["sphere_radius"])).max() > 0
