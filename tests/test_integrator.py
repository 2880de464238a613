"""Integrator correctness vs the scalar oracle (tests/oracle.py).

Deterministic paths (escape, emissive hit, specular chains) must match the
oracle almost exactly; stochastic paths (diffuse scatter, glass branch
selection) must match in expectation within Monte-Carlo error.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle as orc
from ptx.core import linalg
from ptx.geom import spans
from ptx.geom.tape import Plane, Sphere, Union
from ptx.integrate.trace import compile_scene, first_hit, trace_rays
from ptx.shade.materials import Material


# ---------------------------------------------------------------------------
# reflect/refract math vs oracle
# ---------------------------------------------------------------------------

def test_reflect_refract_match_oracle():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    n = rng.normal(size=(64, 3)).astype(np.float32)
    eta = rng.uniform(0.3, 2.5, size=64).astype(np.float32)

    got_refl = np.asarray(linalg.reflect(jnp.array(d), jnp.array(n)))
    got_rs = np.asarray(linalg.refract_strength(jnp.array(d), jnp.array(eta), jnp.array(n)))
    got_rd = np.asarray(linalg.refract(jnp.array(d), jnp.array(eta), jnp.array(n)))
    for i in range(64):
        np.testing.assert_allclose(got_refl[i], orc.reflect(d[i], n[i]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got_rs[i],
                                   orc.refract_strength(d[i], eta[i], n[i]),
                                   rtol=3e-3, atol=2e-4)
        np.testing.assert_allclose(got_rd[i], orc.refract(d[i], eta[i], n[i]),
                                   rtol=3e-3, atol=3e-4)


def test_refract_total_internal_reflection():
    d = jnp.array([[1.0, -0.05, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    eta = jnp.array([2.4])   # glancing + dense→sparse: TIR
    assert float(linalg.refract_strength(d, eta, n)[0]) == 0.0
    assert np.allclose(np.asarray(linalg.refract(d, eta, n))[0], 0.0)


# ---------------------------------------------------------------------------
# first-hit walk priorities (path-trace.h:66-99)
# ---------------------------------------------------------------------------

def _mk_spanlist(rows):
    """rows: list of (t0, t1, m0, m1, valid)."""
    k = len(rows)
    t0 = np.array([[r[0] for r in rows]], np.float32)
    t1 = np.array([[r[1] for r in rows]], np.float32)
    m0 = np.array([[r[2] for r in rows]], np.int32)
    m1 = np.array([[r[3] for r in rows]], np.int32)
    v = np.array([[r[4] for r in rows]], bool)
    n0 = np.tile(np.array([0, 0, 1], np.float32), (1, k, 1))
    n1 = np.tile(np.array([0, 1, 0], np.float32), (1, k, 1))
    return spans.SpanList(*map(jnp.asarray, (t0, n0, m0, t1, n1, m1, v)))


def test_first_hit_enter():
    h = first_hit(_mk_spanlist([(2.0, 5.0, 3, 4, True)]))
    assert bool(h["hit"][0]) and bool(h["entering"][0])
    assert float(h["t"][0]) == 2.0 and int(h["mat_id"][0]) == 3
    np.testing.assert_allclose(np.asarray(h["normal"])[0], (0, 0, 1))


def test_first_hit_exit_from_inside():
    # span straddles the origin: start < EPS <= end → exit boundary,
    # negated end normal, end material
    h = first_hit(_mk_spanlist([(-1.0, 5.0, 3, 4, True)]))
    assert bool(h["hit"][0]) and not bool(h["entering"][0])
    assert float(h["t"][0]) == 5.0 and int(h["mat_id"][0]) == 4
    np.testing.assert_allclose(np.asarray(h["normal"])[0], (0, -1, 0))


def test_first_hit_escape_at_max():
    h = first_hit(_mk_spanlist([(2e20, 3e20, 1, 1, True)]))
    assert not bool(h["hit"][0])
    h = first_hit(_mk_spanlist([(-1.0, 2e20, 1, 1, True)]))
    assert not bool(h["hit"][0])


def test_first_hit_skips_behind_and_invalid():
    h = first_hit(_mk_spanlist([
        (-5.0, -2.0, 9, 9, True),     # fully behind: skipped
        (1.0, 2.0, 7, 7, False),      # masked slot: skipped
        (3.0, 4.0, 5, 6, True),       # the hit
    ]))
    assert bool(h["hit"][0]) and float(h["t"][0]) == 3.0
    assert int(h["mat_id"][0]) == 5


def test_first_hit_miss():
    h = first_hit(_mk_spanlist([(-5.0, -2.0, 9, 9, True)]))
    assert not bool(h["hit"][0])


# ---------------------------------------------------------------------------
# end-to-end vs oracle
# ---------------------------------------------------------------------------

SKY_N = [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (1, 0, 0), (-1, 0, 0)]


def _sky_pair(emissive):
    sky_p = Material(reflect=0.0, scatter=0.0, emissive=emissive)
    sky_o = orc.OMaterial(reflect=0.0, scatter=0.0, emissive=emissive)
    mine = [Plane(np.asarray(n, np.float32), 200.0, sky_p) for n in SKY_N]
    theirs = [orc.OPlane(n, 200.0, sky_o) for n in SKY_N]
    return mine, theirs


def _rays(n, seed=0, z=-1.0):
    rng = np.random.default_rng(seed)
    d = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                  np.full(n, z)], axis=-1).astype(np.float32)
    o = np.zeros_like(d)
    return o, d


def test_emissive_enclosure_exact():
    mine, theirs = _sky_pair((0.3, 0.5, 0.9))
    scene = compile_scene(Union(*mine))
    o, d = _rays(16)
    out = jax.jit(lambda p, o, d: trace_rays(scene, p, o, d,
                                             jax.random.PRNGKey(0), depth=3))(
        scene.params, jnp.array(o), jnp.array(d))
    np.testing.assert_allclose(np.asarray(out),
                               np.tile((0.3, 0.5, 0.9), (16, 1)), atol=1e-5)


def test_specular_chain_matches_oracle():
    """Mirror sphere in a directionally-varying emissive enclosure:
    deterministic single path per ray (scatter=0 ⇒ no sampling)."""
    mirror = Material(reflect=(0.9, 0.8, 0.7), scatter=0.0)
    mirror_o = orc.OMaterial(reflect=(0.9, 0.8, 0.7), scatter=0.0)
    # make each sky wall a different color so reflection direction matters
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (0, 1, 1), (1, 0, 1)]
    sky_mine = [Plane(np.asarray(n, np.float32), 200.0,
                      Material(reflect=0.0, scatter=0.0, emissive=c))
                for n, c in zip(SKY_N, colors)]
    sky_theirs = [orc.OPlane(n, 200.0,
                             orc.OMaterial(reflect=0.0, scatter=0.0, emissive=c))
                  for n, c in zip(SKY_N, colors)]
    mine = Union(Sphere((0.0, 0.0, -4.0), 1.5, mirror), *sky_mine)
    theirs = orc.OUnion(orc.OSphere((0, 0, -4), 1.5, mirror_o), *sky_theirs)

    scene = compile_scene(mine)
    o, d = _rays(24, seed=3)
    got = np.asarray(jax.jit(
        lambda p, o, d: trace_rays(scene, p, o, d, jax.random.PRNGKey(1),
                                   depth=6))(scene.params, jnp.array(o),
                                             jnp.array(d)))
    rng = np.random.default_rng(0)
    for i in range(24):
        want = orc.trace_ray(theirs, o[i].astype(float), d[i].astype(float),
                             6, rng)
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_diffuse_expectation_matches_oracle():
    """Diffuse sphere over bright sky: my single-path estimator averaged
    over many sample keys vs the oracle's branching estimator."""
    diffuse = Material(reflect=0.8, scatter=1.0)
    diffuse_o = orc.OMaterial(reflect=0.8, scatter=1.0)
    sky_mine, sky_theirs = _sky_pair((0.7, 0.8, 1.0))
    mine = Union(Sphere((0.0, 0.0, -4.0), 1.5, diffuse), *sky_mine)
    theirs = orc.OUnion(orc.OSphere((0, 0, -4), 1.5, diffuse_o), *sky_theirs)
    scene = compile_scene(mine)

    d_single = np.array([0.1, 0.05, -1.0])
    S = 4096
    o = jnp.zeros((S, 3))
    d = jnp.tile(jnp.asarray(d_single, jnp.float32), (S, 1))
    got = np.asarray(jax.jit(
        lambda p, o, d: trace_rays(scene, p, o, d, jax.random.PRNGKey(7),
                                   depth=4))(scene.params, o, d))
    mean_mine = got.mean(axis=0)
    sem_mine = got.std(axis=0) / np.sqrt(S)

    rng = np.random.default_rng(11)
    N = 100
    samples = np.stack([
        orc.trace_ray(theirs, np.zeros(3), d_single, 4, rng, scatter_cap=8)
        for _ in range(N)])
    mean_orc = samples.mean(axis=0)
    sem_orc = samples.std(axis=0) / np.sqrt(N)
    tol = 4.0 * np.sqrt(sem_mine ** 2 + sem_orc ** 2) + 1e-3
    assert np.all(np.abs(mean_mine - mean_orc) < tol), (
        mean_mine, mean_orc, tol)


@pytest.mark.slow
def test_fanout_strength_termination_matches_oracle():
    """Diffuse sphere over a diffuse floor: after a full-strength diffuse
    bounce the reference's child strength is divided by the ~10⁴ fan-out
    count (path-trace.h:130,162), so children that then hit the floor STOP
    there (emissive-only) instead of bouncing floor→sky.  Without that
    division the single-path estimator keeps bouncing and reads ~15%
    brighter (the round-2 diffuse-sphere parity failure).  A single convex
    sphere can't see this — scattered rays never re-hit geometry — which
    is exactly why the scene needs the floor."""
    diffuse = Material(reflect=0.8, scatter=1.0)
    diffuse_o = orc.OMaterial(reflect=0.8, scatter=1.0)
    sky_mine, sky_theirs = _sky_pair((0.7, 0.8, 1.0))
    floor = Plane(np.array([0.0, 1.0, 0.0], np.float32), 1.5, diffuse)
    floor_o = orc.OPlane((0, 1, 0), 1.5, diffuse_o)
    mine = Union(Sphere((0.0, 0.5, -4.0), 1.0, diffuse), floor, *sky_mine)
    theirs = orc.OUnion(orc.OSphere((0, 0.5, -4), 1.0, diffuse_o), floor_o,
                        *sky_theirs)
    scene = compile_scene(mine)

    # aim at the sphere's lower front so scattered rays often reach the floor
    d_single = np.array([0.0, -0.12, -1.0])
    S = 4096
    o = jnp.zeros((S, 3))
    d = jnp.tile(jnp.asarray(d_single, jnp.float32), (S, 1))
    got = np.asarray(jax.jit(
        lambda p, o, d: trace_rays(scene, p, o, d, jax.random.PRNGKey(9),
                                   depth=5))(scene.params, o, d))
    mean_mine = got.mean(axis=0)
    sem_mine = got.std(axis=0) / np.sqrt(S)

    rng = np.random.default_rng(13)
    N = 60
    samples = np.stack([
        orc.trace_ray(theirs, np.zeros(3), d_single, 5, rng, scatter_cap=16)
        for _ in range(N)])
    mean_orc = samples.mean(axis=0)
    sem_orc = samples.std(axis=0) / np.sqrt(N)
    tol = 4.0 * np.sqrt(sem_mine ** 2 + sem_orc ** 2) + 2e-3
    assert np.all(np.abs(mean_mine - mean_orc) < tol), (
        mean_mine, mean_orc, tol)


@pytest.mark.slow
def test_glass_expectation_matches_oracle():
    """Glass sphere: my stochastic transmit/reflect selection vs the
    oracle's deterministic weighted sum of both branches."""
    glass = Material(reflect=0.7, scatter=0.0, transmit=0.9, ior=1.3,
                     transmit_reflect=1.0)
    glass_o = orc.OMaterial(reflect=0.7, scatter=0.0, transmit=0.9, ior=1.3,
                            transmit_reflect=1.0)
    colors = [(1, 0.2, 0.2), (0.2, 1, 0.2), (0.2, 0.2, 1),
              (1, 1, 0.2), (0.2, 1, 1), (1, 0.2, 1)]
    sky_mine = [Plane(np.asarray(n, np.float32), 200.0,
                      Material(reflect=0.0, scatter=0.0, emissive=c))
                for n, c in zip(SKY_N, colors)]
    sky_theirs = [orc.OPlane(n, 200.0,
                             orc.OMaterial(reflect=0.0, scatter=0.0, emissive=c))
                  for n, c in zip(SKY_N, colors)]
    mine = Union(Sphere((0.0, 0.0, -4.0), 1.5, glass), *sky_mine)
    theirs = orc.OUnion(orc.OSphere((0, 0, -4), 1.5, glass_o), *sky_theirs)
    scene = compile_scene(mine)

    d_single = np.array([0.25, 0.1, -1.0])
    S = 8192
    o = jnp.zeros((S, 3))
    d = jnp.tile(jnp.asarray(d_single, jnp.float32), (S, 1))
    got = np.asarray(jax.jit(
        lambda p, o, d: trace_rays(scene, p, o, d, jax.random.PRNGKey(5),
                                   depth=8))(scene.params, o, d))
    mean_mine = got.mean(axis=0)
    sem_mine = got.std(axis=0) / np.sqrt(S)

    rng = np.random.default_rng(2)
    want = orc.trace_ray(theirs, np.zeros(3), d_single, 8, rng)
    tol = 5.0 * sem_mine + 5e-3
    assert np.all(np.abs(mean_mine - want) < tol), (mean_mine, want, tol)


def test_total_internal_reflection_deterministic():
    """From inside glass at a glancing angle, refract_strength is 0 ⇒ the
    transmit branch is never taken and the path is a deterministic mirror
    chain (path-trace.h:110-121 with refractStrength=0) — compare exactly
    against the oracle."""
    glass = Material(reflect=(0.9, 0.8, 0.7), scatter=0.0, transmit=0.9,
                     ior=2.4, transmit_reflect=1.0)
    glass_o = orc.OMaterial(reflect=(0.9, 0.8, 0.7), scatter=0.0,
                            transmit=(0.9, 0.9, 0.9), ior=2.4,
                            transmit_reflect=1.0)
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (0, 1, 1), (1, 0, 1)]
    sky_mine = [Plane(np.asarray(n, np.float32), 200.0,
                      Material(reflect=0.0, scatter=0.0, emissive=c))
                for n, c in zip(SKY_N, colors)]
    sky_theirs = [orc.OPlane(n, 200.0,
                             orc.OMaterial(reflect=0.0, scatter=0.0,
                                           emissive=c))
                  for n, c in zip(SKY_N, colors)]
    # ray starts INSIDE the sphere, hits the surface at a glancing angle:
    # sin(theta) > 1/2.4 ⇒ TIR at the exit boundary
    center = np.array([0.0, 0.0, -4.0])
    mine = Union(Sphere(center.astype(np.float32), 1.5, glass), *sky_mine)
    theirs = orc.OUnion(orc.OSphere(center, 1.5, glass_o), *sky_theirs)
    scene = compile_scene(mine)

    o = np.tile(center + np.array([1.2, 0.0, 0.0]), (8, 1)).astype(np.float32)
    d = np.tile(np.array([0.05, 1.0, 0.1]) / np.linalg.norm([0.05, 1.0, 0.1]),
                (8, 1)).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda p, o, d: trace_rays(scene, p, o, d, jax.random.PRNGKey(2),
                                   depth=8))(scene.params, jnp.asarray(o),
                                             jnp.asarray(d)))
    rng = np.random.default_rng(0)
    want = orc.trace_ray(theirs, o[0].astype(float), d[0].astype(float),
                         8, rng)
    for i in range(8):
        np.testing.assert_allclose(got[i], want, rtol=5e-3, atol=5e-3)


# ---------------------------------------------------------------------------
# exact cap sampler vs rejection oracle
# ---------------------------------------------------------------------------

def test_exact_scatter_sampler_matches_rejection():
    """The production zero-rejection cap sampler must draw from the SAME
    distribution as the batched-rejection transcription of the reference's
    loops (path-trace.h:138-158): compare first and second moments of the
    accepted directions over 64k draws for a spread of surface geometries
    and scatter coefficients, including near-specular bias regimes."""
    from ptx.integrate.trace import (sample_scatter_dir,
                                     sample_scatter_dir_rejection)

    N = 65536
    rng = np.random.default_rng(7)
    cases = [
        # (direction, normal, scatter_c)
        ([0.0, 0.0, -1.0], [0.0, 0.0, 1.0], 1.0),       # fully diffuse
        ([0.0, 0.0, -1.0], [0.0, 0.0, 1.0], 0.55),      # biased
        ([0.6, -0.4, -0.69], [0.1, 0.2, 0.97], 0.85),   # oblique
        ([0.6, -0.4, -0.69], [0.0, 0.0, -1.0], 0.7),    # down normal (frame)
        ([1.0, 0.0, -0.05], [0.0, 0.0, 1.0], 0.95),     # grazing
        ([0.0, 0.0, -1.0], [0.0, 0.0, 1.0], 0.12),      # strong bias, small cap
    ]
    exact_f = jax.jit(lambda k, d, n, s: sample_scatter_dir(k, d, n, s))
    rej_f = jax.jit(
        lambda k, d, n, s: sample_scatter_dir_rejection(k, d, n, s))
    for i, (d, n, sc) in enumerate(cases):
        d = jnp.broadcast_to(jnp.asarray(d, jnp.float32), (N, 3))
        n = jnp.broadcast_to(
            jnp.asarray(np.asarray(n) / np.linalg.norm(n), np.float32),
            (N, 3))
        s = jnp.full((N,), sc, jnp.float32)
        ka = jax.random.PRNGKey(100 + i)
        kb = jax.random.PRNGKey(200 + i)
        da, oka = exact_f(ka, d, n, s)
        db, okb = rej_f(kb, d, n, s)
        da, oka = np.asarray(da), np.asarray(oka)
        db, okb = np.asarray(db), np.asarray(okb)
        # acceptance: exact sampler never abandons a feasible cap; the
        # 32-try rejection oracle abandons up to (1-p_try)^32 (~0.5% in
        # the small-cap down-normal case) — accepted draws stay unbiased
        assert oka.all()
        assert okb.mean() > 0.99
        da, db = da[oka], db[okb]
        # mean direction: MC std of each component ~ 1/sqrt(N) ≈ 0.004
        np.testing.assert_allclose(da.mean(0), db.mean(0), atol=0.02,
                                   err_msg=f"case {i} mean")
        # second moments (3x3)
        np.testing.assert_allclose(da.T @ da / len(da),
                                   db.T @ db / len(db), atol=0.02,
                                   err_msg=f"case {i} covariance")
        # every accepted sample leaves the surface
        assert (np.einsum("ij,ij->i", da, np.asarray(n)[: len(da)])
                > 0).all()


def test_exact_scatter_sampler_infeasible_cap_abandons():
    """When no direction can leave the surface (the ball cap is empty),
    both samplers abandon the path — the reference's 1000-try bailout
    (path-trace.h:144-152) in its ideal limit."""
    from ptx.integrate.trace import (sample_scatter_dir,
                                     sample_scatter_dir_rejection)
    # reflected points INTO the surface: bias drags every candidate below
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (64, 3))
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (64, 3))
    s = jnp.full((64,), 0.4, jnp.float32)
    _, oka = sample_scatter_dir(jax.random.PRNGKey(0), d, n, s)
    _, okb = sample_scatter_dir_rejection(jax.random.PRNGKey(1), d, n, s)
    assert not np.asarray(oka).any()
    assert not np.asarray(okb).any()
