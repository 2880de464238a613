"""The integrator: scene compilation + the wavefront bounce loop.

The reference's ``traceRay`` (``/root/reference/include/path-trace.h:59-165``)
is a per-ray recursion: walk the span stream for the first boundary past
``eps``, add emission, then recurse into a transmission branch *and* a
scatter branch (the scatter branch fanning out into
``scatter_ray_count = int(10000·strength·addFactor·scatter)`` children).

TPU-native re-conception
------------------------
Recursion and branching become a masked ``lax.scan`` over bounces carrying
a wavefront of rays ``(origin, dir, throughput, strength, alive)``.  At
each hit exactly **one** continuation is sampled:

- transmit with probability ``p = refract_factor`` (the reference's branch
  weight), scaled by ``transmit / p · refract_factor = transmit``;
- otherwise scatter, whose reference weight ``addFactor·factor·reflect``
  divided by the selection probability ``addFactor`` leaves
  ``factor·reflect``.

This one-sample estimator has the same expectation as the reference's
branching recursion; the reference's adaptive ``scatter_ray_count`` fan-out
is itself only a variance-control knob, recovered here by raising
samples-per-pixel (uniform work is what the hardware wants).  The
``strength`` value threads through exactly as in the reference — it is a
*termination heuristic*, not part of the estimator — so path lengths match.

Gradients: boundary/branch *selection* is piecewise-constant (wrapped in
``stop_gradient``); everything gathered through the selection — hit
distances, normals, texture lookups, Fresnel weights — stays
differentiable w.r.t. scene parameters, which is what the BASELINE
pixel-gradient metric differentiates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ptx.core import linalg, rng
from ptx.core.constants import DEFAULT_RAY_DEPTH, EPS, MAX_VALUE
from ptx.geom import tape
from ptx.shade import materials as mats
from ptx.shade import textures as tx

# Tries for the scatter-direction rejection sampler.  The reference
# resamples up to 1000 times and abandons the path beyond that
# (path-trace.h:144-152); joint cube∧hemisphere acceptance is ≥ ~0.27 per
# try, so 32 tries leave a ≤5e-5 abandonment probability — the same
# give-up semantics, reached sooner.  All tries draw from ONE batched
# uniform call (no per-try transcendentals), then the first acceptable
# candidate is selected — identical distribution to the reference's
# sequential cube-rejection ball sampling (vector3d.h:163-185).
SCATTER_TRIES = 32


@dataclasses.dataclass(eq=False)
class CompiledScene:
    """A scene lowered to arrays + pure functions.

    ``params`` is the differentiable pytree: geometry leaves, transform
    matrices, texture constants/factors/matrices/images, per-material ior.

    Two equivalent geometry paths exist: ``hit_fn`` (the production
    single-sort direct first-hit, ptx.geom.fasthit) and ``spans_fn`` +
    :func:`first_hit` (the span-merge reference path, kept for span-level
    consumers and as a cross-check oracle).

    ``eq=False`` keeps identity ``__eq__``/``__hash__`` so instances can be
    jit static args (render/adaptive pass the scene statically).
    """
    params: dict
    spans_fn: Callable          # (params, origin, dir) -> SpanList
    material_fn: Callable       # (params, pos, mat_id) -> slot dict
    n_materials: int
    plan: Any = None
    hit_fn: Callable = None     # (params, origin, dir) -> first-hit dict


def compile_scene(root, fast: bool = True,
                  pallas: bool | None = None) -> CompiledScene:
    """Compile a scene tree.

    ``pallas`` selects the fused Pallas first-hit megakernel
    (ptx.ops.fasthit_kernel); default: on when running on TPU, overridable
    via the PTX_PALLAS env var ("1"/"0").
    """
    import os

    from ptx.geom.fasthit import compile_fast_hit

    ordered_materials, mat_ids = mats.assign_material_ids(root)
    geo_params, spans_fn, plan = tape.compile_geometry(root, mat_ids)
    compiler = tx.TextureCompiler()
    mat_params, material_fn = mats.compile_material_table(
        ordered_materials, compiler)
    params = dict(geo_params)
    params.update(mat_params)
    params.update(compiler.finalize())

    if pallas is None:
        env = os.environ.get("PTX_PALLAS")
        if env is not None:
            pallas = env == "1"
        else:
            pallas = jax.default_backend() == "tpu"
    if fast and pallas:
        from ptx.ops.fasthit_kernel import build_hit_kernel
        hit_fn = build_hit_kernel(plan)
    elif fast:
        hit_fn = compile_fast_hit(plan)
    else:
        hit_fn = None
    return CompiledScene(params=params, spans_fn=spans_fn,
                         material_fn=material_fn,
                         n_materials=len(ordered_materials), plan=plan,
                         hit_fn=hit_fn)


# ---------------------------------------------------------------------------
# first hit
# ---------------------------------------------------------------------------

def first_hit(sl):
    """Resolve the span walk of path-trace.h:66-99 in one vectorized pass.

    Per span, in list order, the reference returns on the first of:
      1. ``t0 >= MAX_VALUE``   → escaped (black)
      2. ``t0 >= EPS``         → hit entry boundary (normal, 1/ior)
      3. ``t1 >= MAX_VALUE``   → escaped
      4. ``t1 >= EPS``         → hit exit boundary (−normal, ior)
    No span triggering ⇒ miss.
    Returns dict of (t, normal, mat_id, entering, hit) — ``hit`` False for
    both miss and escape.
    """
    c1 = sl.t0 >= MAX_VALUE
    c2 = sl.t0 >= EPS
    c3 = sl.t1 >= MAX_VALUE
    c4 = sl.t1 >= EPS
    trigger = sl.valid & (c1 | c2 | c3 | c4)
    any_trigger = jnp.any(trigger, axis=-1)
    idx = jnp.argmax(trigger, axis=-1)            # first triggering span
    idx = jax.lax.stop_gradient(idx)

    take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
    take3 = lambda a: jnp.take_along_axis(a, idx[..., None, None], axis=-2)[..., 0, :]
    s_c1, s_c2, s_c3 = take(c1), take(c2), take(c3)
    escaped = s_c1 | (~s_c2 & s_c3)
    entering = ~s_c1 & s_c2

    t = jnp.where(entering, take(sl.t0), take(sl.t1))
    normal = jnp.where(entering[..., None], take3(sl.n0), -take3(sl.n1))
    mat_id = jnp.where(entering, take(sl.m0), take(sl.m1))
    hit = any_trigger & ~escaped
    return {
        "t": jnp.where(hit, t, 0.0),
        "normal": normal,
        "mat_id": jax.lax.stop_gradient(jnp.where(hit, mat_id, 0)),
        "entering": entering,
        "hit": hit,
    }


# ---------------------------------------------------------------------------
# scatter direction sampling
# ---------------------------------------------------------------------------

def sample_scatter_dir(key, direction, normal, scatter_c):
    """Reference scatter sampling (path-trace.h:138-158): draw a uniform
    point in the unit ball, add ``(1/sc − 1)·reflected``, accept when the
    result leaves the surface (``dot(n, d) > EPS``), normalize.  For
    ``sc <= EPS`` the perfect mirror direction is used directly.

    Returns (dir, ok): ``ok`` False for abandoned paths (reference's
    1000-try bailout).
    """
    reflected = linalg.reflect(direction, normal)
    sc = jnp.clip(scatter_c, 0.0, 1.0)
    specular = sc <= EPS
    safe_sc = jnp.where(specular, 1.0, sc)
    bias = (1.0 / safe_sc - 1.0)[..., None] * reflected

    # one batched draw for every try: (..., T, 3) uniforms in [-1, 1]
    u = jax.random.uniform(key, direction.shape[:-1] + (SCATTER_TRIES, 3),
                           minval=-1.0, maxval=1.0)
    in_ball = jnp.sum(u * u, axis=-1) <= 1.0          # cube→ball rejection
    cand = u + bias[..., None, :]
    above = jnp.einsum("...i,...ti->...t", normal, cand) > EPS
    ok_t = in_ball & above
    accepted = jnp.any(ok_t, axis=-1)
    first = jnp.argmax(ok_t, axis=-1)
    first = jax.lax.stop_gradient(first)
    chosen = jnp.take_along_axis(cand, first[..., None, None],
                                 axis=-2)[..., 0, :]
    accepted = jax.lax.stop_gradient(accepted)

    out = jnp.where(specular[..., None], reflected, linalg.normalize(chosen))
    ok = specular | accepted
    return out, ok


# ---------------------------------------------------------------------------
# bounce scan
# ---------------------------------------------------------------------------

def trace_rays(scene: CompiledScene, params, origin, direction, key,
               depth: int = DEFAULT_RAY_DEPTH, remat: bool = True):
    """Trace a wavefront of rays to radiance estimates ``(..., 3)``.

    ``origin``/``direction`` have shape ``(..., 3)``; one stochastic path
    is followed per ray for up to ``depth`` bounces (+ the primary hit).
    ``remat`` rematerializes each bounce in reverse-mode (O(1) residual
    memory per bounce); turn off when chunk sizes leave headroom and the
    backward pass dominates.
    """
    batch_shape = origin.shape[:-1]

    def bounce(carry, bounce_idx):
        o, d, throughput, strength, alive, radiance = carry
        k = rng.fold(key, bounce_idx)

        if scene.hit_fn is not None:
            hit = scene.hit_fn(params, o, d)
        else:
            hit = first_hit(scene.spans_fn(params, o, d))
        live_hit = alive & hit["hit"]

        pos = o + hit["t"][..., None] * d
        m = scene.material_fn(params, pos, hit["mat_id"])

        radiance = radiance + jnp.where(
            live_hit[..., None], throughput * m["emissive"], 0.0)

        # Continuation gate: depth remaining and strength above threshold
        # (path-trace.h:105).  bounce_idx == depth is the final,
        # emission-only evaluation.
        cont = live_hit & (bounce_idx < depth) & (strength >= EPS)

        normal = hit["normal"]
        rel_ior = jnp.where(hit["entering"], 1.0 / m["ior"], m["ior"])

        trc = jnp.clip(m["transmit_reflect_f"], 0.0, 1.0)
        refract_factor = trc * linalg.refract_strength(d, rel_ior, normal)
        refr_dir = linalg.refract(d, rel_ior, normal)
        refr_ok = (refract_factor > EPS) & jnp.any(refr_dir != 0.0, axis=-1)
        p_transmit = jnp.where(refr_ok, refract_factor, 0.0)

        u = jax.random.uniform(rng.fold(k, 1), batch_shape)
        take_transmit = jax.lax.stop_gradient(u < p_transmit) & cont
        add_factor = 1.0 - p_transmit
        # reference: if addFactor < eps the scatter branch is skipped
        # (path-trace.h:122-125)
        scatter_alive = cont & ~take_transmit & (add_factor >= EPS)

        # --- transmit branch ---
        transmit_tint = m["transmit"]
        # --- scatter branch ---
        scat_dir, scat_ok = sample_scatter_dir(
            rng.fold(k, 2), d, normal, m["scatter_f"])
        sc = jnp.clip(m["scatter_f"], 0.0, 1.0)
        factor = 1.0 - (1.0 - linalg.dot(scat_dir, normal)) * sc
        scatter_alive = scatter_alive & scat_ok

        new_alive = take_transmit | scatter_alive
        new_dir = jnp.where(take_transmit[..., None], refr_dir, scat_dir)
        branch_tint = jnp.where(take_transmit[..., None], transmit_tint,
                                factor[..., None] * m["reflect"])
        new_throughput = throughput * branch_tint

        # Reference strength bookkeeping (path-trace.h:118,162) — the
        # termination heuristic, deliberately NOT importance-compensated.
        tr_strength = strength * refract_factor * linalg.norm(transmit_tint)
        sc_strength = (strength * add_factor * factor
                       * linalg.norm(m["reflect"]))
        new_strength = jnp.where(take_transmit, tr_strength, sc_strength)

        o = jnp.where(new_alive[..., None], pos, o)
        d = jnp.where(new_alive[..., None], new_dir, d)
        throughput = jnp.where(new_alive[..., None], new_throughput, throughput)
        strength = jnp.where(new_alive, new_strength, strength)
        return (o, d, throughput, strength, new_alive, radiance), None

    init = (
        origin,
        direction,
        jnp.ones(batch_shape + (3,), jnp.float32),
        jnp.ones(batch_shape, jnp.float32),
        jnp.ones(batch_shape, bool),
        jnp.zeros(batch_shape + (3,), jnp.float32),
    )
    if remat:
        bounce = jax.checkpoint(bounce)   # O(1) residuals/bounce in reverse
    (_, _, _, _, _, radiance), _ = jax.lax.scan(
        bounce, init, jnp.arange(depth + 1))
    return radiance
