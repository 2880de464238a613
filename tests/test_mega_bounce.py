"""Fused mega bounce (megasweep + shade + scatter in one launch,
ptx.ops.megasweep bounce mode) vs the unfused XLA composition — the
large-scene analogue of test_bounce_kernel.

The fused kernel must be a drop-in for `_bounce_live` at any leaf
count: same carry, same decisions (the row-fed replay backward is
shared).  Decision equality is EXACT on CPU (interpret megasweep is
`_evt`-exact vs the fixpoint hit — test_large_scenes); carries tolerate
f32 reassociation and the in-kernel `_acos` polynomial only.  ONE
interpret call per bounce (CLAUDE.md interpret-cost rule).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.integrate import trace as tr
from ptx.scenes.builders import stress_gadgets, stress_spheres


def _rays(B, seed=0):
    rng = np.random.default_rng(seed)
    o = np.stack([rng.uniform(-3, 3, B), rng.uniform(-3, 3, B),
                  np.full(B, 12.0)], -1).astype(np.float32)
    d = np.stack([rng.uniform(-0.4, 0.4, B), rng.uniform(-0.4, 0.4, B),
                  -np.ones(B)], -1).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d)


def _chain(scene, o, d, keys, use_fused):
    B = o.shape[0]
    carry = (o, d, jnp.ones((B, 3)), jnp.ones(B), jnp.ones(B, bool))
    decs = []
    for k in keys:
        carry, dec = tr._bounce_live(scene, scene.params, *carry, k, True,
                                     use_fused=use_fused)
        decs.append(dec)
    return carry, decs


@pytest.mark.parametrize("builder,n", [(stress_spheres, 25),
                                       (stress_gadgets, 12)])
def test_mega_fused_bounce_matches_unfused(builder, n, monkeypatch):
    monkeypatch.setenv("PTX_PALLAS", "1")
    monkeypatch.setenv("PTX_FUSED", "1")
    scene = tr.compile_scene(builder(n))
    assert scene.bounce_fn is not None, "mega fused bounce not built"
    assert scene.bounce_bwd_fn is not None

    B = 512
    o, d = _rays(B, seed=1)
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(21)]
    cf, df = _chain(scene, o, d, keys, use_fused=True)
    cu, du = _chain(scene, o, d, keys, use_fused=False)
    for name, a, b in zip(("o2", "d2", "thr2", "strength2", "alive2"),
                          cf, cu):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool:
            assert (a == b).all(), name
        else:
            # one-ulp t_star reassociation (in-kernel fixpoint vs jnp
            # sweep) scales to a few e-5 RELATIVE on 38-200-unit
            # positions; real bugs show up orders of magnitude larger
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=5e-4,
                                       err_msg=name)
    # bounce 1 runs from IDENTICAL inputs → one-ulp-tight; bounce 2
    # inherits the carry divergence, which the acos sampler and long
    # sky-plane flights (~400 units) amplify geometrically on a few
    # lanes — tolerances scale per bounce.  Real formula bugs show up
    # at O(0.1); the boolean decisions above stay EXACT on both bounces.
    for bi, (dec_f, dec_u) in enumerate(zip(df, du)):
        for kname in ("evt", "entering", "hit", "mat_id", "take_transmit",
                      "scatter_alive"):
            assert (np.asarray(dec_f[kname])
                    == np.asarray(dec_u[kname])).all(), kname
        # the acos sampler's endpoint sensitivity (d z/d carg → ∞ at
        # carg ±1) amplifies even one-ulp normal differences to ~2e-4
        # on a few lanes, already on bounce 1
        np.testing.assert_allclose(np.asarray(dec_f["u_sel"]),
                                   np.asarray(dec_u["u_sel"]), atol=5e-4)
        np.testing.assert_allclose(np.asarray(dec_f["t"]),
                                   np.asarray(dec_u["t"]),
                                   rtol=1e-5 if bi == 0 else 5e-3,
                                   atol=5e-5 if bi == 0 else 5e-4)
