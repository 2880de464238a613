"""The composed workload class: large CSG scene UNDER an HDR probe.

The reference demo's actual big-scene shape is ``unionArray`` CSG inside
an equirect-HDR sky enclosure (/root/reference/src/test.cpp:52-64,
97-105,123,134-140).  Rounds 3-4 measured the large-scene machinery
(megasweep / fused mega bounce / compaction) and the image-sky machinery
(sky-select emission, binned-histogram image gradients) SEPARATELY —
these tests run them in one program (VERDICT r4 #1): the stress scenes'
sky planes carrying the demo's Multiply→SphericalCoords→ImageTex chain.

The hardware throughput rows live in tools/scale_bench.py (--sky) and
the hardware loss/grad gate in tools/tpu_golden.py (gate 5); here the
CPU-checkable semantics:

- sky-select on/off is radiance-EXACT on the composed scene (the
  terminal-chain argument of trace.py's post-scan block holds with the
  mega-shaped scene + compaction active);
- gradients flow to the sky image (nonzero) and stay finite through
  compaction + manual VJP;
- the fused mega bounce stays eligible and decision-exact with the
  image-sky material table (the sky only changes EMISSIVE slots —
  const non-emissive eligibility must be unaffected).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.integrate import trace as tr
from ptx.scenes.builders import (procedural_sky_image, stress_gadgets,
                                 stress_spheres)


def _rays(B, seed=0):
    rng = np.random.default_rng(seed)
    o = np.stack([rng.uniform(-3, 3, B), rng.uniform(-1, 3, B),
                  np.full(B, 10.0)], -1).astype(np.float32)
    d = np.stack([rng.uniform(-0.5, 0.5, B), rng.uniform(-0.5, 0.3, B),
                  -np.ones(B)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("builder,n", [(stress_spheres, 16),
                                       (stress_gadgets, 8)])
def test_composed_skysel_exact_and_grads_finite(builder, n):
    img = procedural_sky_image(32, 64)
    scene = tr.compile_scene(builder(n, sky_image=img), pallas=False)
    # the composed scene must route the same way the demo does: one
    # terminal dynamic emissive chain → sky-select + mat-sum
    assert len(scene.material_fn.terminal_dynamic_emissive) == 1

    B = 1024
    o, d = _rays(B, seed=3)
    key = jax.random.PRNGKey(5)

    def rad(skysel):
        return jax.jit(lambda p: tr.trace_rays(
            scene, p, o, d, key, 8, compact=True,
            skysel=skysel))(scene.params)

    r_sel = np.asarray(rad(True))
    r_all = np.asarray(rad(False))
    assert np.isfinite(r_sel).all()
    # sky-select is exact for radiance (at most one bounce per path
    # carries a nonzero terminal-emission term) — f32 summation-order
    # tolerance only
    np.testing.assert_allclose(r_sel, r_all, rtol=2e-5, atol=2e-6)

    def loss(p):
        return jnp.mean(tr.trace_rays(scene, p, o, d, key, 8,
                                      compact=True))

    v, g = jax.jit(jax.value_and_grad(loss))(scene.params)
    assert np.isfinite(float(v))
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    img_gsum = sum(float(jnp.abs(l).sum())
                   for l in jax.tree.leaves(g["images"]))
    assert img_gsum > 0.0, "sky image received no gradient"


def test_composed_mega_bounce_stays_eligible_and_exact(monkeypatch):
    """The image sky changes only emissive slots — the fused mega bounce
    (const non-emissive eligibility) must still build, and its bounce-1
    decisions must match the unfused XLA path exactly (same gate class
    as test_mega_bounce; ONE interpret call per path)."""
    monkeypatch.setenv("PTX_PALLAS", "1")
    monkeypatch.setenv("PTX_FUSED", "1")
    img = procedural_sky_image(32, 64)
    scene = tr.compile_scene(stress_spheres(25, sky_image=img))
    assert scene.bounce_fn is not None, \
        "image sky broke mega-bounce eligibility"
    assert scene.bounce_bwd_fn is not None

    B = 512
    o, d = _rays(B, seed=1)
    key = jax.random.PRNGKey(7)
    carry = (o, d, jnp.ones((B, 3)), jnp.ones(B), jnp.ones(B, bool))
    _, dec_f = tr._bounce_live(scene, scene.params, *carry, key, True,
                               use_fused=True)
    _, dec_u = tr._bounce_live(scene, scene.params, *carry, key, True,
                               use_fused=False)
    for kname in ("evt", "entering", "hit", "mat_id", "take_transmit",
                  "scatter_alive"):
        assert (np.asarray(dec_f[kname])
                == np.asarray(dec_u[kname])).all(), kname


def test_tile_order_permutation_is_identity_at_depth0():
    """trace_rays' large-scene tile ordering (scene.tile_hint) permutes
    rays into 16×32 image tiles and inverse-permutes radiance.  At depth
    0 the per-ray radiance is RNG-free (primary hit + emission only), so
    the tiled and untiled results must be IDENTICAL pixel-for-pixel — a
    broken inverse permutation scrambles the image."""
    scene = tr.compile_scene(stress_spheres(16), pallas=False)
    from ptx.integrate.camera import Camera, sample_rays
    cam = Camera.reference_demo(64, 64)
    key = jax.random.PRNGKey(2)
    o, d = sample_rays(cam, key, jnp.arange(32), jnp.arange(64), 1)

    r_plain = np.asarray(jax.jit(
        lambda p: tr.trace_rays(scene, p, o, d, key, 0))(scene.params))
    scene.tile_hint = True
    r_tiled = np.asarray(jax.jit(
        lambda p: tr.trace_rays(scene, p, o, d, key, 0))(scene.params))
    scene.tile_hint = False
    assert r_plain.shape == r_tiled.shape == (1, 32, 64, 3)
    np.testing.assert_array_equal(r_tiled, r_plain)
    assert float(np.abs(r_plain).max()) > 0
