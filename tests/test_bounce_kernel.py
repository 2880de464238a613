"""Fused bounce megakernel (ptx.ops.bounce_kernel) vs the unfused XLA
composition.

The fused kernel must be a drop-in for `_bounce_live`: same carry, same
decisions (the backward replay is shared), same RNG draw semantics.  The
only tolerated deltas are f32 reassociation and the in-kernel `_acos`
polynomial (≤ ~1e-6 on scattered directions).

Interpret-mode pallas on CPU costs ~30-100 s per kernel call (every SMEM
scalar read is emulated), so CPU tests compose at most two bounces by
hand; the full scan path is exercised on real TPU by
``test_fused_trace_rays_tpu`` (auto-skipped off-TPU), by bench.py, and by
the parity harness.
"""

import os

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from ptx.integrate import trace as tr
from ptx.scenes.builders import make_world


@pytest.fixture
def fused_scene(monkeypatch):
    monkeypatch.setenv("PTX_PALLAS", "1")
    monkeypatch.setenv("PTX_FUSED", "1")
    scene = tr.compile_scene(make_world())
    assert scene.bounce_fn is not None
    return scene


def _rays(B, seed=0):
    rng = np.random.default_rng(seed)
    d = np.stack([rng.uniform(-0.6, 0.6, B), rng.uniform(-0.6, 0.6, B),
                  -np.ones(B)], -1).astype(np.float32)
    return jnp.zeros((B, 3), jnp.float32), jnp.asarray(d)


def _init(B):
    return (jnp.ones((B, 3)), jnp.ones(B), jnp.ones(B, bool))


def _chain(scene, o, d, keys, use_fused):
    """Hand-rolled two-bounce composition (no scan — interpret-mode
    pallas in a scan is prohibitively slow on CPU)."""
    thr, st, al = _init(o.shape[0])
    decs = []
    carry = (o, d, thr, st, al)
    for k in keys:
        carry, dec = tr._bounce_live(scene, scene.params, *carry, k, True,
                                     use_fused=use_fused)
        decs.append(dec)
    return carry, decs


def test_fused_bounce_matches_unfused(fused_scene):
    scene = fused_scene
    B = 256
    o, d = _rays(B)
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(21)]

    cf, df = _chain(scene, o, d, keys, use_fused=True)
    cu, du = _chain(scene, o, d, keys, use_fused=False)
    for name, a, b in zip(("o2", "d2", "thr2", "strength2", "alive2"),
                          cf, cu):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool:
            assert (a == b).all(), name
        else:
            # rtol: position magnitudes reach the 200-unit sky planes, so
            # one-ulp t differences scale to ~3e-5 absolute
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=5e-6,
                                       err_msg=name)
    for dec_f, dec_u in zip(df, du):
        for kname in ("evt", "entering", "hit", "mat_id", "take_transmit",
                      "scatter_alive"):
            assert (np.asarray(dec_f[kname])
                    == np.asarray(dec_u[kname])).all(), kname
        np.testing.assert_allclose(np.asarray(dec_f["u_sel"]),
                                   np.asarray(dec_u["u_sel"]), atol=5e-6)


def test_fused_forward_gradients_match_autodiff(fused_scene):
    """One custom-VJP bounce step with the FUSED forward (decisions from
    the kernel, replay in XLA) vs plain autodiff through the unfused
    live bounce — validates that the kernel's decision outputs drive the
    shared replay correctly."""
    scene = fused_scene
    B = 128
    o, d = _rays(B, seed=5)
    k = jax.random.PRNGKey(2)
    thr0, st0, al0 = _init(B)
    w = jnp.array([0.3, 1.1, 0.6])
    bs = tr._make_manual_bounce(scene)
    from ptx.core import rng as prng
    u_coin = jax.random.uniform(prng.fold(k, 1), (B,))
    u3 = jax.random.uniform(prng.fold(k, 2), (B, 3))

    def em_term(params, pos, mid, live, thr):
        # the post-scan emission sum trace_rays builds from the ys
        em = scene.material_fn.eval_emissive(params, pos, mid)
        return jnp.sum(jnp.where(live[..., None], thr * em, 0.0) * w)

    def loss_manual(params):
        # ys is the packed (B, 8) per-bounce emission row: pos | thr |
        # mat_id | live (mirrors trace_rays's unpack, trace.py ~:919)
        (o2, d2, thr2, st2, al2), ys = bs(params, o, d, thr0, st0, al0,
                                          k, True, u_coin, u3)
        pos = jax.lax.stop_gradient(ys[:, 0:3])
        thr = ys[:, 3:6]
        mid = jax.lax.stop_gradient(ys[:, 6]).astype(jnp.int32)
        live = ys[:, 7] > 0.5
        # touch emission AND the differentiable continuation state
        return (em_term(params, pos, mid, live, thr) + 1e-3 * jnp.sum(thr2)
                + 1e-4 * jnp.sum(d2 * d2))

    def loss_auto(params):
        (o2, d2, thr2, st2, al2), dec = tr._bounce_live(
            scene, params, o, d, thr0, st0, al0, k, True,
            use_fused=False)
        pos = jax.lax.stop_gradient(o + dec["t"][..., None] * d)
        return (em_term(params, pos, dec["mat_id"], al0 & dec["hit"], thr0)
                + 1e-3 * jnp.sum(thr2)
                + 1e-4 * jnp.sum(d2 * d2))

    gm = jax.grad(loss_manual)(scene.params)
    ga = jax.grad(loss_auto)(scene.params)
    flat_m, _ = jax.flatten_util.ravel_pytree(
        {k_: v for k_, v in gm.items() if k_ != "images"})
    flat_a, _ = jax.flatten_util.ravel_pytree(
        {k_: v for k_, v in ga.items() if k_ != "images"})
    denom = np.maximum(np.abs(np.asarray(flat_a)), 1e-3)
    rel = np.abs(np.asarray(flat_m) - np.asarray(flat_a)) / denom
    assert np.quantile(rel, 0.99) < 5e-3, float(np.quantile(rel, 0.99))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="full-scan fused path needs real TPU "
                           "(interpret-mode pallas in scan is ~100 s/call)")
def test_fused_trace_rays_tpu():
    # two gates (tools/tpu_golden.py runs the same on-chip routinely):
    # depth 0 is decision-free ⇒ strict per-lane agreement; deep paths
    # may legitimately decorrelate on 1-ulp coin/texel flips between the
    # kernel's and XLA's transcendentals ⇒ statistical gate.  The old
    # per-lane depth-6 atol assert would fail for that benign reason —
    # and, had it ever run, would also have caught the round-2 emission
    # kernel bf16 hi/lo folding bug (see ptx/ops/emission_kernel.py).
    os.environ["PTX_FUSED"] = "1"
    scene_f = tr.compile_scene(make_world())
    os.environ["PTX_FUSED"] = "0"
    scene_u = tr.compile_scene(make_world())
    B = 4096
    o, d = _rays(B, seed=3)
    key = jax.random.PRNGKey(11)
    rf0 = np.asarray(tr.trace_rays(scene_f, scene_f.params, o, d, key,
                                   depth=0, compact=False))
    ru0 = np.asarray(tr.trace_rays(scene_u, scene_u.params, o, d, key,
                                   depth=0, compact=False))
    assert np.isfinite(rf0).all()
    rel0 = np.abs(rf0 - ru0).max(-1) / np.abs(ru0).max()
    assert np.percentile(rel0, 99) < 1e-4       # whole-population bugs
    assert (rel0 > 1e-3).mean() < 0.02          # _acos texel flips
    rf = np.asarray(tr.trace_rays(scene_f, scene_f.params, o, d, key,
                                  depth=6, compact=False))
    ru = np.asarray(tr.trace_rays(scene_u, scene_u.params, o, d, key,
                                  depth=6, compact=False))
    assert np.isfinite(rf).all()
    assert (np.abs(rf - ru).max(-1) > 1e-3).mean() < 0.02
    assert abs(rf.mean() - ru.mean()) / ru.mean() < 5e-3
