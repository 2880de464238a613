"""Row-fed replay backward kernel (ptx.ops.replay_bwd) vs the XLA
decision-frozen replay VJP — the large-scene analogue of
test_bounce_kernel's gradient gates.

The kernel must produce the same carry/param cotangents as
``jax.vjp(_bounce_replay)`` for any leaf count (it is built whenever the
scene's materials are const and L exceeds the fused-kernel unroll
budget).  Interpret-mode pallas is slow on CPU, so each scene runs ONE
kernel call at a 512-lane wavefront (padded to one 4096-lane grid step).
"""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from ptx.integrate import trace as tr
from ptx.scenes.builders import stress_gadgets, stress_spheres


def _scene(builder, n, monkeypatch):
    monkeypatch.setenv("PTX_PALLAS", "1")   # CPU: jnp hit + row-fed bwd
    monkeypatch.setenv("PTX_FUSED", "1")
    scene = tr.compile_scene(builder(n))
    return scene


def _rays(B, seed=0):
    """Half random spread, half aimed at the object band so the
    refract/transmit branch's backward is exercised (random spray alone
    yields ~2 take_transmit lanes of 512 on the gadget scene)."""
    rng = np.random.default_rng(seed)
    o = np.stack([rng.uniform(-3, 3, B), rng.uniform(-1, 3, B),
                  np.full(B, 12.0)], -1).astype(np.float32)
    d = np.stack([rng.uniform(-0.4, 0.4, B), rng.uniform(-0.4, 0.4, B),
                  -np.ones(B)], -1).astype(np.float32)
    h = B // 2
    tgt = np.stack([rng.uniform(-3, 3, h), rng.uniform(-1.0, -0.3, h),
                    rng.uniform(-9, -3, h)], -1).astype(np.float32)
    aim = tgt - o[:h]
    d[:h] = aim / np.linalg.norm(aim, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _q99(a, b):
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-3)
    return float(np.quantile(rel, 0.99))


@pytest.mark.parametrize("builder,n", [(stress_spheres, 25),
                                       (stress_gadgets, 12)])
def test_rowfed_bwd_matches_xla_replay(builder, n, monkeypatch):
    scene = _scene(builder, n, monkeypatch)
    assert scene.bounce_bwd_fn is not None, "row-fed kernel not built"
    # scene.bounce_fn may be the fused MEGA bounce (tested separately in
    # test_mega_bounce); this test drives the UNFUSED live path + kernel
    # backward explicitly.

    B = 512
    o, d = _rays(B, seed=3)
    thr = jnp.full((B, 3), 0.8)
    st = jnp.ones(B)
    alive = jnp.ones(B, bool)
    k = jax.random.PRNGKey(9)
    _, dec = tr._bounce_live(scene, scene.params, o, d, thr, st, alive,
                             k, True, use_fused=False)
    assert bool(np.asarray(dec["hit"]).any()), "degenerate fixture"

    rng = np.random.default_rng(11)
    cts = tuple(jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
                for _ in range(3))

    d_o, d_d, d_thr, d_params = scene.bounce_bwd_fn(
        scene.params, o, d, thr, dec, *cts)

    def rep(params, o_, d_, thr_, st_):
        return tr._bounce_replay(scene, params, o_, d_, thr_, st_,
                                 alive, dec)

    _, vjp = jax.vjp(rep, scene.params, o, d, thr, st)
    rp, ro, rd, rthr, _rst = vjp((*cts, jnp.zeros(B)))

    # grazing lanes (guaranteed by the aimed rays) have near-singular
    # replay jacobians (d t/d params → ∞ at tangency): both paths agree
    # to f32 there but the relative error legitimately grows — so the
    # tail gate is 2e-2 while the bulk must be sharp (q75 < 1e-3)
    for a, b in ((d_o, ro), (d_d, rd), (d_thr, rthr)):
        assert _q99(a, b) < 2e-2
        av, bv = np.asarray(a).ravel(), np.asarray(b).ravel()
        rel = np.abs(av - bv) / np.maximum(np.abs(bv), 1e-3)
        assert float(np.quantile(rel, 0.75)) < 1e-3
    flat_k, _ = jax.flatten_util.ravel_pytree(
        {n_: v for n_, v in d_params.items() if n_ != "images"})
    flat_r, _ = jax.flatten_util.ravel_pytree(
        {n_: v for n_, v in rp.items() if n_ != "images"})
    # per-leaf sums are dominated by the grazing lanes' near-singular
    # contributions, so the tail tolerance is wider than the lane gates;
    # the bulk must still be sharp
    assert _q99(flat_k, flat_r) < 0.1
    relp = (np.abs(np.asarray(flat_k) - np.asarray(flat_r))
            / np.maximum(np.abs(np.asarray(flat_r)), 1e-3))
    assert float(np.quantile(relp, 0.75)) < 1e-3
    # every array finite
    for t in (d_o, d_d, d_thr, flat_k):
        assert np.isfinite(np.asarray(t)).all()


def test_replay_lane_math_grazing_tir_gradient_finite():
    """eta = 1 with d ⊥ n gives arg ≡ 0 EXACTLY (f32: all small
    integers) and rd_ok admits it — sqrt'(0) = inf would NaN d(ior)
    even under zero cotangents (0·inf).  Compaction filler lanes
    construct this exact lane; the inlined kernel copy of the refract
    guard missed the round-3 linalg fix and poisoned the ior gradient
    the first time the replay backward ran under compaction on
    hardware.  Pure-jnp gate (no pallas): a MISS lane (hit=False ⇒ the
    unit normal placeholder (0, 0, 1)) with d = (1, 0, 0) ⊥ n and
    entering=False ⇒ rel_ior = ior = 1 gives arg = 1 - 1·(1 - 0) = 0
    exactly — the filler-lane shape."""
    from ptx.ops.bounce_kernel import replay_lane_math

    eye_tail = np.concatenate([np.eye(3, 4).reshape(-1),
                               np.eye(3).reshape(-1)]).astype(np.float32)
    row_np = np.concatenate([[0.0, 0.0, 0.0, 1.0, 0.0], eye_tail])
    B = 4
    on = jnp.ones((B,), jnp.float32)

    def f(row_v, ior):
        row = tuple(row_v[j] * on for j in range(26))
        ms = (0.5 * on, 0.0 * on, 0.5 * on, 0.0 * on, 0.9 * on,
              0.9 * on, 0.9 * on, ior * on)
        tt = jnp.ones((B,), bool)
        out = replay_lane_math(
            row, tt, on, ms,
            (0.0 * on, 0.0 * on, 0.0 * on),
            (1.0 * on, 0.0 * on, 0.0 * on),   # d ⊥ miss placeholder n
            (on, on, on),
            is_start=tt, hit=~tt, entering=~tt, take_transmit=~tt,
            scatter_alive=~tt,
            u_sel=(0.1 * on, 0.2 * on, 0.3 * on))
        # RUNTIME-zero cotangents (a trace-time 0.0 weight gets pruned
        # before the transpose ever evaluates the 0·inf product)
        w0 = jnp.where(on > 0.0, 0.0, 1.0)
        return sum(jnp.sum(v * w0) for v in out)

    g_row, g_ior = jax.grad(f, argnums=(0, 1))(jnp.asarray(row_np),
                                               jnp.float32(1.0))
    assert np.isfinite(np.asarray(g_row)).all()
    assert np.isfinite(float(g_ior)), "0*inf NaN through sqrt(arg=0)"
