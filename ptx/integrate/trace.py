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
import os
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from ptx.core import linalg, rng
from ptx.core.constants import DEFAULT_RAY_DEPTH, EPS, MAX_VALUE
from ptx.geom import tape
from ptx.shade import materials as mats
from ptx.shade import textures as tx

# Tries for the batched-rejection scatter sampler
# (sample_scatter_dir_rejection — the cross-check oracle; production uses
# the exact zero-rejection cap sampler, sample_scatter_dir).  The
# reference resamples up to 1000 times and abandons the path beyond that
# (path-trace.h:144-152); joint cube∧hemisphere acceptance is ≥ ~0.27 per
# try, so 32 tries leave a ≤5e-5 abandonment probability.
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
    hit_replay_fn: Callable = None   # (params, o, d, evt, entering, hit)
    bounce_fn: Callable = None  # fused bounce kernel (ptx.ops.bounce_kernel)
    bounce_bwd_fn: Callable = None   # fused replay-VJP kernel (same module)
    emission_fn: Callable = None     # fused emission kernel (ptx.ops.emission_kernel)
    _manual_bounce: Callable = None  # cached custom-VJP bounce step
    # large-scene TPU path: trace_rays tiles (rows, cols) batches into
    # 16×32-pixel blocks so each 512-lane kernel block is a compact 2-D
    # image tile — primary-block cull frustums were scene-spanning image
    # rows before (100% of (cluster, block) pairs active,
    # tools/cull_stats.py round 5; tiling measured +56% fwd at L=256
    # depth 4, neutral at depth 16)
    tile_hint: bool = False


def compile_scene(root, fast: bool = True,
                  pallas: bool | None = None) -> CompiledScene:
    """Compile a scene tree.

    ``pallas`` selects the fused Pallas first-hit megakernel
    (ptx.ops.fasthit_kernel); default: on when running on TPU, overridable
    via the PTX_PALLAS env var ("1"/"0").

    Scene building runs under a CPU default device: it is hundreds of
    small EAGER jnp ops (tape constants, texture tables, kernel
    metadata), and on the remote-TPU backend each eager dispatch pays
    ~30-150 ms of tunnel latency — measured 25-140 s of scene_build for
    the 13-leaf demo (tools/compile_breakdown.py, round 5) vs ~1 s
    locally.  The arrays are uncommitted, so the first jitted call
    transfers them to the accelerator exactly as before.
    """
    import os

    from ptx.geom.fasthit import compile_fast_hit

    if pallas is None:
        env = os.environ.get("PTX_PALLAS")
        if env is not None:
            pallas = env == "1"
        else:
            pallas = jax.default_backend() == "tpu"
    if jax.default_backend() != "cpu":
        cpus = jax.devices("cpu")
        if cpus:
            with jax.default_device(cpus[0]):
                scene = _compile_scene_body(root, fast, pallas)
            # ONE batched transfer back to the accelerator: params left
            # committed to CPU would otherwise be re-transferred (or
            # worse, re-sharded) on EVERY dispatch — measured 406.9 →
            # 150 Mrays/s on the bench chain before this device_put
            scene.params = jax.device_put(scene.params, jax.devices()[0])
            return scene
    return _compile_scene_body(root, fast, pallas)


def _compile_scene_body(root, fast: bool, pallas: bool) -> CompiledScene:
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
    # The Pallas megakernel unrolls 2L·L compares at build time — the right
    # trade at demo scale, unusable (code size / compile time) at L≈100+.
    # Large scenes route to the candidate-blocked jnp path instead
    # (ptx.geom.fasthit module docstring).
    from ptx.geom.fasthit import collect_leaves as _cl
    n_leaves = len(_cl(plan))
    kernel_max = int(os.environ.get("PTX_PALLAS_MAX_LEAVES", "24"))
    if fast and pallas and n_leaves <= kernel_max:
        from ptx.ops.fasthit_kernel import build_hit_kernel
        hit_fn = build_hit_kernel(plan)
    elif fast:
        # params_ref: initial parameter values, used only for compile-time
        # spatial cluster ASSIGNMENT in the megasweep (bounds are always
        # recomputed from live params — ptx.ops.megasweep)
        hit_fn = compile_fast_hit(plan, params_ref=params)
    else:
        hit_fn = None
    hit_replay_fn = None
    if hit_fn is not None:
        from ptx.geom import hitreplay
        from ptx.geom.fasthit import collect_leaves
        hit_replay_fn = hitreplay.build_hit_replay(collect_leaves(plan))

    # fused bounce kernel: only when the Pallas hit path is active AND
    # every non-emissive material slot is a Constant (the kernel packs
    # them into SMEM; emission — the one slot that may gather image
    # textures — stays in XLA).  PTX_FUSED=0 forces the unfused path.
    bounce_fn = None
    bounce_bwd_fn = None
    fused_env = os.environ.get("PTX_FUSED")
    want_fused = (fused_env == "1") or (fused_env is None and pallas)
    if (want_fused and fast and pallas and n_leaves <= kernel_max
            and not any(material_fn.dynamic_slots[s]
                        for s in ("reflect", "scatter", "transmit",
                                  "transmit_reflect"))):
        from ptx.ops.bounce_kernel import (build_bounce_bwd_kernel,
                                           build_bounce_kernel)
        from ptx.geom.fasthit import collect_leaves
        lv = collect_leaves(plan)
        mats_np = [lf.mat_id for lf, _ in lv]
        meta = (material_fn.const_idx, material_fn.n_materials)
        bounce_fn = build_bounce_kernel(plan, meta, mats_np)
        bounce_bwd_fn = build_bounce_bwd_kernel(plan, meta, mats_np)
    elif (want_fused and fast and pallas and hit_fn is not None
          and os.environ.get("PTX_RBWD") != "0"
          and not any(material_fn.dynamic_slots[s]
                      for s in ("reflect", "scatter", "transmit",
                                "transmit_reflect"))):
        # Large scenes (L > kernel_max): the replay backward still rides
        # a Pallas kernel, but ROW-FED — the winner's packed parameter
        # row is gathered in XLA and the per-lane replay VJP runs
        # in-kernel, L-independent (ptx.ops.replay_bwd).  Same const-
        # material eligibility as the fused bounce; PTX_RBWD=0 disables.
        from ptx.ops.replay_bwd import build_replay_bwd
        from ptx.geom.fasthit import collect_leaves, compile_mega_bounce
        lv = collect_leaves(plan)
        meta = (material_fn.const_idx, material_fn.n_materials)
        mats_np = [lf.mat_id for lf, _ in lv]
        bounce_bwd_fn = build_replay_bwd(lv, meta, mats_np)
        if os.environ.get("PTX_MEGAB") != "0":
            # fused mega bounce: hit + shade + scatter in the one
            # megasweep launch (None when the tape is not mega-eligible)
            bounce_fn = compile_mega_bounce(plan, params, meta, mats_np)

    # fused emission kernel (trig + MXU one-hot VMEM image gather + const
    # select in one launch): eligible when the scene has exactly one
    # supported dynamic emissive chain (ptx.ops.emission_kernel docstring)
    emission_fn = None
    # Policy (round 3): when EVERY dynamic emissive chain is terminal
    # (reflect ≡ transmit ≡ 0 — sky enclosures), SKIP the fused emission
    # kernel: trace_rays's sky-select + mat-sum path evaluates the image
    # chain on one bounce-selected lane per path (~1.4·B lanes) while the
    # kernel evaluates every post-scan lane (~5.4·B) — measured 377.7 vs
    # 353.6 Mrays/s fwd+bwd on the demo bench.  PTX_EMK=1 forces the
    # kernel (A/B knob), PTX_EMK=0 disables it unconditionally.
    emk_env = os.environ.get("PTX_EMK")
    term_mis = {mi for mi, m in enumerate(ordered_materials)
                if isinstance(m.reflect, tx.Constant)
                and not np.any(np.asarray(m.reflect.color, np.float32))
                and isinstance(m.transmit, tx.Constant)
                and not np.any(np.asarray(m.transmit.color, np.float32))}
    all_term = (set(material_fn.dynamic_slots["emissive"]) <= term_mis
                and material_fn.dynamic_slots["emissive"])
    want_emk = (emk_env == "1"
                or (emk_env is None and not all_term))
    if want_fused and fast and pallas and want_emk:
        from ptx.ops import emission_kernel
        if emission_kernel.supported(material_fn, compiler.images):
            emission_fn = emission_kernel.build_emission_fn(
                material_fn, compiler.images)
    return CompiledScene(params=params, spans_fn=spans_fn,
                         material_fn=material_fn,
                         n_materials=len(ordered_materials), plan=plan,
                         hit_fn=hit_fn, hit_replay_fn=hit_replay_fn,
                         bounce_fn=bounce_fn, bounce_bwd_fn=bounce_bwd_fn,
                         emission_fn=emission_fn,
                         tile_hint=bool(fast and pallas
                                        and n_leaves > kernel_max))


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

def sample_scatter_dir(key, direction, normal, scatter_c, return_raw=False,
                       u3=None):
    """Exact (zero-rejection) reference scatter sampling.

    The reference draws uniform points in the unit ball, adds
    ``bias = (1/sc − 1)·reflected``, and rejects until the result leaves
    the surface (``dot(n, u + bias) > EPS``; path-trace.h:138-158,
    vector3d.h:163-185).  The accepted ``u`` is therefore *uniform over
    the ball cap* ``{|u| ≤ 1, n̂·u > c}`` with ``c = (EPS − n·bias)/|n|``
    — which this sampler draws directly, with THREE uniforms per lane
    instead of the rejection loop's ≈96 (tools/fwd_breakdown.py measured
    the (B, 32, 3) candidate draws as the dominant forward cost):

    - height ``z ∈ [c, 1]`` with density ∝ (1 − z²) (the disk area at
      height z).  The CDF ``g(z) = z − z³/3`` inverts in closed form via
      the trigonometric cubic root ``z = 2·cos(acos(−1.5·G)/3 − 2π/3)``;
    - a uniform point on the radius-``√(1−z²)`` disk (angle + √radius);
    - mapped through a branchless orthonormal frame around ``n̂``
      (Duff et al. 2017, "Building an Orthonormal Basis, Revisited").

    Distribution-identical to :func:`sample_scatter_dir_rejection`
    (asserted statistically in tests/test_integrator.py); abandonment
    (``ok`` False) now happens exactly when the cap is empty — the ideal
    limit of the reference's 1000-try bailout.  For ``sc <= EPS`` the
    perfect mirror direction is used directly.

    ``return_raw`` appends the in-ball draw ``u`` (..., 3) — the manual
    bounce VJP saves it so the backward replay reconstructs
    ``normalize(u + bias)`` differentiably (:func:`_bounce_replay`).
    """
    reflected = linalg.reflect(direction, normal)
    sc = jnp.clip(scatter_c, 0.0, 1.0)
    specular = sc <= EPS
    safe_sc = jnp.where(specular, 1.0, sc)
    bias = (1.0 / safe_sc - 1.0)[..., None] * reflected

    # acceptance threshold in the unit-normal frame (normals arrive unit
    # from the hit paths; |n| guarded for dead lanes)
    m2 = jnp.sum(normal * normal, axis=-1)
    m = jnp.sqrt(jnp.where(m2 == 0.0, 1.0, m2))
    nhat = normal / m[..., None]
    c = (EPS - jnp.einsum("...i,...i->...", normal, bias,
                          precision=jax.lax.Precision.HIGHEST)) / m
    feasible = c < 1.0
    cc = jnp.clip(c, -1.0, 1.0)

    if u3 is None:
        u3 = jax.random.uniform(key, direction.shape[:-1] + (3,))
    g = lambda z: z - z * z * z * (1.0 / 3.0)
    G = g(cc) + u3[..., 0] * (g(1.0) - g(cc))
    arg = jnp.clip(-1.5 * G, -1.0, 1.0)
    z = 2.0 * jnp.cos(jnp.arccos(arg) * (1.0 / 3.0) - 2.0 * jnp.pi / 3.0)
    z = jnp.clip(z, cc, 1.0)
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0) * u3[..., 1])
    phi = (2.0 * jnp.pi) * u3[..., 2]
    x, y = r * jnp.cos(phi), r * jnp.sin(phi)

    nx, ny, nz = nhat[..., 0], nhat[..., 1], nhat[..., 2]
    s = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    e1 = jnp.stack([1.0 + s * nx * nx * a, s * b, -s * nx], axis=-1)
    e2 = jnp.stack([b, s + ny * ny * a, -ny], axis=-1)
    u = jax.lax.stop_gradient(
        x[..., None] * e1 + y[..., None] * e2 + z[..., None] * nhat)

    out = jnp.where(specular[..., None], reflected,
                    linalg.normalize(u + bias))
    ok = specular | jax.lax.stop_gradient(feasible)
    if return_raw:
        return out, ok, u
    return out, ok


def sample_scatter_dir_rejection(key, direction, normal, scatter_c,
                                 return_raw=False):
    """The batched-rejection form of the scatter sampler (round-1
    production; kept as the cross-check oracle for the exact sampler and
    for the stream-matched LCG parity path): one (..., T, 3) cube draw,
    first candidate satisfying (in-ball ∧ above-surface) wins — see
    :func:`select_scatter_dir`.

    Returns (dir, ok): ``ok`` False for abandoned paths (reference's
    1000-try bailout; ≤5e-5 here with T=32 — joint acceptance ≥ ~0.27).
    """
    u = jax.random.uniform(key, direction.shape[:-1] + (SCATTER_TRIES, 3),
                           minval=-1.0, maxval=1.0)
    return select_scatter_dir(u, direction, normal, scatter_c,
                              return_raw=return_raw)


def select_scatter_dir(u, direction, normal, scatter_c, return_raw=False):
    """The selection half of the reference scatter sampler, driven by a
    pre-drawn candidate array ``u`` (..., T, 3) of cube uniforms.

    The reference consumes ONE cube-draw stream: its inner do-while
    (vector3d.h:173-180) skips draws outside the unit ball, its outer
    do-while (path-trace.h:145-157) skips in-ball draws that fail the
    above-surface test — so its accepted sample is exactly the FIRST draw
    satisfying (in-ball ∧ above), which is this argmax.  Validated
    draw-for-draw against a scalar transcription on ReferenceLCG streams
    in tests/test_rng.py."""
    reflected = linalg.reflect(direction, normal)
    sc = jnp.clip(scatter_c, 0.0, 1.0)
    specular = sc <= EPS
    safe_sc = jnp.where(specular, 1.0, sc)
    bias = (1.0 / safe_sc - 1.0)[..., None] * reflected

    in_ball = jnp.sum(u * u, axis=-1) <= 1.0          # cube→ball rejection
    cand = u + bias[..., None, :]
    above = jnp.einsum("...i,...ti->...t", normal, cand,
                       precision=jax.lax.Precision.HIGHEST) > EPS
    ok_t = in_ball & above
    accepted = jnp.any(ok_t, axis=-1)
    first = jnp.argmax(ok_t, axis=-1)
    first = jax.lax.stop_gradient(first)
    chosen = jnp.take_along_axis(cand, first[..., None, None],
                                 axis=-2)[..., 0, :]
    accepted = jax.lax.stop_gradient(accepted)

    out = jnp.where(specular[..., None], reflected, linalg.normalize(chosen))
    ok = specular | accepted
    if return_raw:
        u_raw = jnp.take_along_axis(u, first[..., None, None],
                                    axis=-2)[..., 0, :]
        return out, ok, u_raw
    return out, ok


# ---------------------------------------------------------------------------
# bounce scan
# ---------------------------------------------------------------------------

def _virtual_fanout(strength, add_factor, sc):
    """The scatter-child count the reference would have spawned at this
    hit: ``int(10000·strength·addFactor·sc)``, clamped to ≥ 1 (and to 1
    for specular), path-trace.h:130-136.  The reference divides each
    child's *strength* by this count, so after one full-diffuse bounce
    from a camera ray (count ≈ 10⁴) children fall below the ``eps``
    termination threshold and stop at their next hit.  The single-path
    estimator must inherit that termination rule — without the division
    ptx's diffuse chains keep bouncing and come out measurably brighter
    (+15% median on the diffuse-sphere parity block, BASELINE.md)."""
    vcount = jnp.floor(10000.0 * strength * add_factor * sc)
    return jnp.where((sc <= EPS) | (vcount < 1.0), 1.0, vcount)


def _bounce_live_fused(scene: CompiledScene, params, o, d, throughput,
                       strength, alive, k, in_depth,
                       u_coin=None, u3=None):
    """Fused-kernel live bounce: ONE Pallas launch does hit + shade +
    scatter + carry update (ptx.ops.bounce_kernel); XLA contributes only
    the threefry draws (bit-identical to the unfused path's; trace_rays
    precomputes all bounces' draws before the scan so the per-iteration
    threefry fusion islands disappear).  Emission/radiance is NOT part of
    the bounce: radiance never feeds the continuation, so trace_rays
    evaluates the emissive chain post-scan over the whole phase at once
    (one batched texture fusion + ONE image-gradient scatter per phase
    instead of per bounce).  Decisions dict is identical in meaning to
    :func:`_bounce_live`'s — the backward replay is shared.  Forward-only
    (wrapped in the custom VJP); outputs carry no gradient graph."""
    batch_shape = o.shape[:-1]
    if u_coin is None:
        u_coin = jax.random.uniform(rng.fold(k, 1), batch_shape)
    if u3 is None:
        u3 = jax.random.uniform(rng.fold(k, 2), batch_shape + (3,))
    kb = scene.bounce_fn(params, o, d, throughput, strength, alive,
                         u_coin, u3, in_depth)
    sg = jax.lax.stop_gradient
    decisions = {
        "evt": kb["evt"],
        "entering": kb["entering"],
        "hit": kb["hit"],
        "mat_id": kb["mat_id"],
        "take_transmit": kb["take_transmit"],
        "scatter_alive": kb["scatter_alive"],
        "u_sel": sg(kb["u_sel"]),
        # the post-scan emissive eval point: pos = o + t·d with a FROZEN
        # t (d emissive/d pos ≡ 0 through nearest-texel gathers, so
        # freezing is exact)
        "t": sg(kb["t"]),
    }
    carry = (sg(kb["o2"]), sg(kb["d2"]), sg(kb["thr2"]),
             sg(kb["strength2"]), kb["alive2"])
    return carry, decisions


def _bounce_live(scene: CompiledScene, params, o, d, throughput, strength,
                 alive, k, in_depth, use_fused: bool = True,
                 u_coin=None, u3=None):
    """One wavefront bounce, live mode: draws RNG, evaluates the first hit
    (Pallas kernel on TPU), makes the stochastic/discrete decisions.

    Returns ``(new_carry, decisions)``; decisions are everything the
    backward replay needs that is either random (branch coin, selected
    scatter draw) or expensive to recompute (the winning hit event) — all
    stop-gradient by construction.  Radiance is NOT accumulated here:
    emission never feeds the continuation, so trace_rays evaluates it
    post-scan for a whole phase at once (see _bounce_live_fused's note).

    ``use_fused=False`` forces the XLA composition even when the scene
    has a fused bounce kernel — required under plain autodiff
    (``trace_rays(manual_vjp=False)``): the kernel is not differentiable.

    ``u_coin``/``u3``: optional precomputed uniforms (the same threefry
    draws this function would make itself from ``k`` — trace_rays batches
    them across bounces before the scan).
    """
    if use_fused and scene.bounce_fn is not None:
        return _bounce_live_fused(scene, params, o, d, throughput,
                                  strength, alive, k, in_depth,
                                  u_coin, u3)
    batch_shape = o.shape[:-1]

    if scene.hit_fn is not None:
        hit = scene.hit_fn(params, o, d)
    else:
        hit = first_hit(scene.spans_fn(params, o, d))
    live_hit = alive & hit["hit"]

    pos = o + hit["t"][..., None] * d
    m = scene.material_fn(params, pos, hit["mat_id"])

    # Continuation gate: depth remaining and strength above threshold
    # (path-trace.h:105).  The final scan step (in_depth False) is the
    # emission-only evaluation.
    cont = live_hit & in_depth & (strength >= EPS)

    normal = hit["normal"]
    rel_ior = jnp.where(hit["entering"], 1.0 / m["ior"], m["ior"])

    trc = jnp.clip(m["transmit_reflect_f"], 0.0, 1.0)
    refract_factor = trc * linalg.refract_strength(d, rel_ior, normal)
    refr_dir = linalg.refract(d, rel_ior, normal)
    refr_ok = (refract_factor > EPS) & jnp.any(refr_dir != 0.0, axis=-1)
    p_transmit = jnp.where(refr_ok, refract_factor, 0.0)

    u = (u_coin if u_coin is not None
         else jax.random.uniform(rng.fold(k, 1), batch_shape))
    take_transmit = jax.lax.stop_gradient(u < p_transmit) & cont
    add_factor = 1.0 - p_transmit
    # reference: if addFactor < eps the scatter branch is skipped
    # (path-trace.h:122-125)
    scatter_alive = cont & ~take_transmit & (add_factor >= EPS)

    # --- transmit branch ---
    transmit_tint = m["transmit"]
    # --- scatter branch ---
    scat_dir, scat_ok, u_sel = sample_scatter_dir(
        rng.fold(k, 2), d, normal, m["scatter_f"], return_raw=True, u3=u3)
    sc = jnp.clip(m["scatter_f"], 0.0, 1.0)
    factor = 1.0 - (1.0 - linalg.dot(scat_dir, normal)) * sc
    scatter_alive = scatter_alive & scat_ok

    new_alive = take_transmit | scatter_alive
    new_dir = jnp.where(take_transmit[..., None], refr_dir, scat_dir)
    branch_tint = jnp.where(take_transmit[..., None], transmit_tint,
                            factor[..., None] * m["reflect"])
    new_throughput = throughput * branch_tint

    # Reference strength bookkeeping (path-trace.h:118,162) — the
    # termination heuristic, deliberately NOT importance-compensated.  It
    # is consumed ONLY by comparisons (the cont gate), so its gradient
    # contribution is identically zero: stop_gradient both documents that
    # and prunes the whole chain from the backward graph.
    tr_strength = strength * refract_factor * linalg.norm(transmit_tint)
    sc_strength = (strength / _virtual_fanout(strength, add_factor, sc)
                   * add_factor * factor * linalg.norm(m["reflect"]))
    new_strength = jnp.where(take_transmit, tr_strength, sc_strength)

    o2 = jnp.where(new_alive[..., None], pos, o)
    d2 = jnp.where(new_alive[..., None], new_dir, d)
    throughput2 = jnp.where(new_alive[..., None], new_throughput, throughput)
    strength2 = jax.lax.stop_gradient(
        jnp.where(new_alive, new_strength, strength))

    sg = jax.lax.stop_gradient
    decisions = {
        "evt": sg(hit["_evt"]) if "_evt" in hit else None,
        "hit": sg(hit["hit"]),
        "entering": sg(hit["entering"]),
        "mat_id": sg(hit["mat_id"]),
        "take_transmit": sg(take_transmit),
        "scatter_alive": sg(scatter_alive),
        "u_sel": sg(u_sel),
        "t": sg(hit["t"]),     # see the fused path's note
    }
    return (o2, d2, throughput2, strength2, new_alive), decisions


def _bounce_replay(scene: CompiledScene, params, o, d, throughput, strength,
                   alive, dec):
    """Differentiable bounce replay: identical math to :func:`_bounce_live`
    with every stochastic draw and discrete selection taken from ``dec``.
    The first hit collapses to the O(1) selected-boundary recompute
    (ptx.geom.hitreplay) — no 2L·L candidate fold in the backward graph.
    Emission is not replayed (radiance lives post-scan in trace_rays and
    is differentiated by plain autodiff there).

    Returns ``(o2, d2, throughput2, strength2)``; the caller pulls
    cotangents through this with ``jax.vjp``.
    """
    t, normal = scene.hit_replay_fn(params, o, d, dec["evt"],
                                    dec["entering"], dec["hit"])
    live_hit = alive & dec["hit"]

    pos = o + t[..., None] * d
    m = scene.material_fn(params, pos, dec["mat_id"])

    rel_ior = jnp.where(dec["entering"], 1.0 / m["ior"], m["ior"])
    trc = jnp.clip(m["transmit_reflect_f"], 0.0, 1.0)
    refract_factor = trc * linalg.refract_strength(d, rel_ior, normal)
    refr_dir = linalg.refract(d, rel_ior, normal)
    refr_ok = (refract_factor > EPS) & jnp.any(refr_dir != 0.0, axis=-1)
    p_transmit = jnp.where(refr_ok, refract_factor, 0.0)
    take_transmit = dec["take_transmit"]
    add_factor = 1.0 - p_transmit

    transmit_tint = m["transmit"]
    # scatter direction from the SAVED accepted draw — no 32-candidate
    # rejection scan in the backward graph (see sample_scatter_dir)
    reflected = linalg.reflect(d, normal)
    sc = jnp.clip(m["scatter_f"], 0.0, 1.0)
    specular = sc <= EPS
    safe_sc = jnp.where(specular, 1.0, sc)
    bias = (1.0 / safe_sc - 1.0)[..., None] * reflected
    scat_dir = jnp.where(specular[..., None], reflected,
                         linalg.normalize(dec["u_sel"] + bias))
    factor = 1.0 - (1.0 - linalg.dot(scat_dir, normal)) * sc
    scatter_alive = dec["scatter_alive"]

    new_alive = take_transmit | scatter_alive
    new_dir = jnp.where(take_transmit[..., None], refr_dir, scat_dir)
    branch_tint = jnp.where(take_transmit[..., None], transmit_tint,
                            factor[..., None] * m["reflect"])
    new_throughput = throughput * branch_tint

    # strength is comparison-only (see _bounce_live): zero true gradient
    tr_strength = strength * refract_factor * linalg.norm(transmit_tint)
    sc_strength = (strength / _virtual_fanout(strength, add_factor, sc)
                   * add_factor * factor * linalg.norm(m["reflect"]))
    new_strength = jnp.where(take_transmit, tr_strength, sc_strength)

    o2 = jnp.where(new_alive[..., None], pos, o)
    d2 = jnp.where(new_alive[..., None], new_dir, d)
    throughput2 = jnp.where(new_alive[..., None], new_throughput, throughput)
    strength2 = jax.lax.stop_gradient(
        jnp.where(new_alive, new_strength, strength))
    return o2, d2, throughput2, strength2


def _float0_zeros(x):
    import numpy as np
    return np.zeros(np.shape(x), jax.dtypes.float0)


def _make_manual_bounce(scene: CompiledScene):
    """Custom-VJP bounce step: forward = live bounce (Pallas hit kernel),
    backward = jax.vjp of the decision-frozen replay.  Residuals per bounce
    shrink to (carry, ~7 decision lanes) and the reverse pass is a compact
    fused elementwise graph — this is what closes the round-1 6.4×
    forward↔backward gap (VERDICT #1)."""

    def _ys(o, d, throughput, alive, dec):
        """Per-bounce emission inputs for the post-scan radiance sum,
        packed into ONE (B, 8) array: pos (3) | thr (3) | mat_id | live.
        ONE scan output = ONE dynamic_update_slice per bounce instead of
        four — each dus dispatch costs ~6 µs of fixed overhead on this
        backend (profiler: ys stacking was ~0.5 ms of the 5 ms forward as
        4 separate buffers).  pos is built from the FROZEN t and carries
        no gradient (d emissive/d pos ≡ 0 through nearest-texel gathers);
        thr is the bounce-input throughput (identity — its ys cotangent
        adds straight to the thr input cotangent; it sits at columns 3:6,
        a layout-preserving (B, 3) slice in the transpose — see the
        (B, 1)-padding rule in docs/perf_roofline.md).  mat_id/live ride
        as small-int-exact f32 casts under stop_gradient."""
        sg = jax.lax.stop_gradient
        pos = sg(o + dec["t"][..., None] * d)
        tail = sg(jnp.stack(
            [dec["mat_id"].astype(jnp.float32),
             (alive & dec["hit"]).astype(jnp.float32)], axis=-1))
        return jnp.concatenate([pos, throughput, tail], axis=-1)

    @jax.custom_vjp
    def bounce_step(params, o, d, throughput, strength, alive,
                    k, in_depth, u_coin, u3):
        out, dec = _bounce_live(scene, params, o, d, throughput, strength,
                                alive, k, in_depth, u_coin=u_coin, u3=u3)
        return out, _ys(o, d, throughput, alive, dec)

    def fwd(params, o, d, throughput, strength, alive, k,
            in_depth, u_coin, u3):
        out, dec = _bounce_live(scene, params, o, d, throughput, strength,
                                alive, k, in_depth, u_coin=u_coin, u3=u3)
        # u_coin/u3 are NOT residuals: the replay consumes the saved
        # accepted draw u_sel, never the raw uniforms
        return (out, _ys(o, d, throughput, alive, dec)), (
            params, o, d, throughput, strength, alive, dec, k, in_depth)

    def bwd(res, ct):
        params, o, d, throughput, strength, alive, dec, k, in_depth = res
        (ct_o, ct_d, ct_thr, ct_stg, _ct_alive), ct_ys = ct
        # ys cotangents: pos is declared gradient-free (exact — see _ys);
        # thr (packed columns 3:6) is an identity output so its cotangent
        # adds directly
        ct_thr_ys = ct_ys[:, 3:6]

        if scene.bounce_bwd_fn is not None:
            # Fused replay-VJP kernel (ptx.ops.bounce_kernel): carry and
            # geometry/material-const cotangents in one launch.  The
            # emissive/radiance term lives post-scan in trace_rays and is
            # differentiated by plain autodiff there.
            d_o, d_d, d_thr, d_params_k = scene.bounce_bwd_fn(
                params, o, d, throughput, dec, ct_o, ct_d, ct_thr)
            return (d_params_k, d_o, d_d, d_thr + ct_thr_ys,
                    jnp.zeros_like(strength), _float0_zeros(alive),
                    _float0_zeros(k), _float0_zeros(in_depth),
                    jnp.zeros_like(strength), jnp.zeros_like(o))

        def rep(params, o, d, throughput, strength):
            return _bounce_replay(scene, params, o, d, throughput, strength,
                                  alive, dec)

        _, vjp = jax.vjp(rep, params, o, d, throughput, strength)
        dparams, do, dd, dthr, dstg = vjp((ct_o, ct_d, ct_thr, ct_stg))
        return (dparams, do, dd, dthr + ct_thr_ys, dstg,
                _float0_zeros(alive),
                _float0_zeros(k), _float0_zeros(in_depth),
                jnp.zeros_like(strength), jnp.zeros_like(o))

    bounce_step.defvjp(fwd, bwd)
    return bounce_step


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pack_gather(cols, keep, tgt, cap):
    """Pack ``cols`` rows where ``keep`` to the front of a ``cap``-wide
    output — scatter-free in BOTH directions.

    TPU scatters cost ~5× gathers at these row counts (profiler), so the
    pack is a row gather at ``src = argsort(~keep)[:cap]`` (stable sort
    puts kept lanes first in lane order; the bool sort is cheap) and the
    hand-written transpose is a row gather of the cotangent at ``tgt``
    (the cumsum pack position, drop slot reading a zero pad row).  When
    fewer than ``cap`` lanes are kept, tail rows carry arbitrary dropped
    lanes — callers mask them via the packed alive column.
    """
    src = jnp.argsort(~keep, stable=True)[:cap]
    return cols[src], src


def _pack_gather_fwd(cols, keep, tgt, cap):
    return _pack_gather(cols, keep, tgt, cap), (keep, tgt)


def _pack_gather_bwd(cap, res, cts):
    keep, tgt = res
    ct, _ct_src = cts
    padded = jnp.concatenate(
        [ct, jnp.zeros((1,) + ct.shape[1:], ct.dtype)], axis=0)
    # kept rows read their pack position; dropped rows the zero pad row
    safe_tgt = jnp.where(keep & (tgt < cap), tgt, cap)
    return padded[safe_tgt], None, None


_pack_gather.defvjp(_pack_gather_fwd, _pack_gather_bwd)


def _compact_wavefront(carry, orig_idx, cap: int, key=None):
    """Compact live lanes into a ``cap``-wide wavefront (dead-lane
    compaction, the TPU way: static shapes, no data-dependent dispatch).

    Live lanes are packed to the front via a prefix-sum scatter with a
    drop slot.  If more than ``cap`` lanes are alive, *systematic
    resampling* keeps exactly ``cap`` of them, evenly spaced in lane
    order WITH A RANDOM PHASE OFFSET, and boosts surviving throughput by
    ``n/cap`` — the unbiased particle-filter estimator (future
    contributions are reweighted; past contributions were already
    banked).  The random offset is load-bearing for PER-PIXEL
    unbiasedness: without it the evenly-spaced keep pattern is a
    deterministic function of the alive mask, which repeats across
    samples and chunks, so the SAME pixels lose their post-compaction
    light in every sample — measured as 2-pixel-period bright/dark
    stripes through the demo lens (tools/parity_vs_reference.py block
    (560, 524): survivors boosted ~2×, dropped pixels near-black, block
    mean exactly right).  With the offset the kept subset varies per
    (key, phase) and the per-pixel expectation is restored.  (Radiance is
    not part of the carry — trace_rays accumulates each phase's emission
    post-scan, indexed by ``orig_idx``.)

    All selection state is integer/boolean (stop-gradient by nature);
    gather/scatter transposes are cheap and exact in reverse mode.
    """
    o, d, throughput, strength, alive = carry

    alive_i = alive.astype(jnp.int32)
    n = jnp.sum(alive_i)
    n_safe = jnp.maximum(n, 1)
    ncap = jnp.minimum(n_safe, cap)
    ranks = jnp.cumsum(alive_i)                      # 1-based among alive
    if key is not None:
        u = jax.random.uniform(key, ())
        off = jnp.floor(u * n_safe.astype(jnp.float32)).astype(jnp.int32)
        off = jnp.clip(off, 0, n_safe - 1)           # phase ∈ [0, n)
    else:
        off = jnp.int32(0)
    lo = ((ranks - 1) * ncap + off) // n_safe
    hi = (ranks * ncap + off) // n_safe
    keep = alive & (hi > lo)                         # exactly min(n, cap)
    w = jnp.where(n > cap, n_safe.astype(jnp.float32) / cap, 1.0)

    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1     # 0-based target
    tgt = jnp.where(keep, pos, cap)                  # cap = drop slot

    # ONE packed scatter: TPU scatter cost is per UPDATE ROW, not per
    # byte (profiler: a (21846,3) and a (21846,) scatter both ~0.6 ms at
    # B=65k), so scattering the 6 carry arrays separately paid ~6× for
    # nothing — pack all 12 columns into one (B, 12) row scatter and
    # unpack.  int32 columns ride along bitcast to f32 (exact).
    # Differentiable columns enter via (B, 3) CONCATENATION, not a stack
    # of (B,) columns: the transpose of a column stack splits the
    # cotangent into (B, 1) arrays whose TPU tile layout pads the lane
    # dim 1 → 128 (33 MB per column at B=65k — ~0.8 ms/step of pure
    # layout traffic in the profile).  Concat transposes to (B, 3)
    # slices, which keep the packed layout.  The non-differentiable tail
    # (strength is comparison-only, alive/orig are int-ish) rides under
    # stop_gradient so its transpose is pruned outright.
    f32 = lambda x: x.astype(jnp.float32)
    rest = jax.lax.stop_gradient(jnp.stack(
        [strength, f32(alive),
         jax.lax.bitcast_convert_type(orig_idx, jnp.float32)], axis=-1))
    cols = jnp.concatenate([o, d, throughput * w, rest], axis=1)  # (B, 12)
    out, _src = _pack_gather(cols, keep, tgt, cap)

    # under-full packs carry arbitrary dropped rows at the tail — mask
    # them dead (the gather-pack has no fill row)
    n_keep = jnp.minimum(ncap, cap)
    packed_live = jnp.arange(cap) < n_keep
    new_alive = packed_live & (out[:, 10] > 0.5)
    new_carry = (
        out[:, 0:3],
        # filler lanes get a safe unit direction (guarded math downstream)
        out[:, 3:6].at[:, 2].add(jnp.where(new_alive, 0.0, -1.0)),
        jnp.where(new_alive[:, None], out[:, 6:9], 0.0),
        jnp.where(new_alive, out[:, 9], 0.0),
        new_alive,
    )
    # drop sentinel on dead tail rows: any value ≥ the ORIGINAL width
    # (orig_idx shrinks per phase, so its own length is NOT safe); the
    # sentinel also keeps the orig vector nondecreasing for the radiance
    # scatter's indices_are_sorted promise
    new_orig = jnp.where(
        new_alive, jax.lax.bitcast_convert_type(out[:, 11], jnp.int32),
        jnp.int32(2 ** 31 - 1))
    return new_carry, new_orig


# Default compaction schedule: (start_bounce, width_divisor).  Measured on
# the demo scene (512², depth 16): alive lanes fall to ~29% after the
# primary+first bounce and below 2% by bounce 6, so later phases run at
# 1/3 and 1/16 width — fewer evaluated segments with identical
# expectation (randomized systematic-resampling overflow keeps it
# unbiased even for scenes where more survive).  Chosen by sweep with an
# equal-spp RMSE guard (round 2, post-fused-kernels): (2,3),(6,16) is
# 23% faster than (2,2),(6,8) at bit-identical RMSE; (2,4) is a further
# 8% but costs +3% RMSE (resampling variance) — rejected.
_COMPACT_SCHEDULE = ((2, 3), (6, 16))
_COMPACT_MIN_BATCH = 16384


def trace_rays(scene: CompiledScene, params, origin, direction, key,
               depth: int = DEFAULT_RAY_DEPTH, remat: bool = True,
               manual_vjp: bool | None = None,
               compact: bool | None = None,
               skysel: bool | None = None):
    """Trace a wavefront of rays to radiance estimates ``(..., 3)``.

    ``origin``/``direction`` have shape ``(..., 3)``; one stochastic path
    is followed per ray for up to ``depth`` bounces (+ the primary hit).

    Reverse mode: by default each bounce is a hand-written custom VJP
    (decision-frozen replay, see :func:`_make_manual_bounce`) whenever the
    scene has a fast hit path.  ``manual_vjp=False`` forces plain autodiff
    (the round-1 path, kept as a cross-check oracle —
    tests/test_gradients.py); there ``remat`` rematerializes each bounce
    (O(1) residual memory; turn off when chunks leave headroom).

    ``compact``: dead-lane compaction between bounce phases (see
    :func:`_compact_wavefront`).  Default: on for large flat batches
    (≥ 16k rays) at depth ≥ 8 — production render/bench shapes — and off
    for the small deterministic-path batches tests use.  Changes which
    stochastic path each ray takes (not the estimator's expectation).

    ``skysel``: evaluate terminal dynamic-emissive chains (sky probes) on
    one bounce-selected lane per path instead of every post-scan lane
    (exact — see the post-scan block below).  Default: env ``PTX_SKYSEL``
    (on).  Only applies when the fused emission kernel is not active.
    """
    batch_shape = origin.shape[:-1]
    # Flatten the wavefront to (B, 3): multi-axis batches (spp, rows, W)
    # compile to markedly worse TPU code than the equivalent flat batch
    # (measured 3× forward at identical ray counts — tools/bwd_bench.py),
    # and RNG draws are bit-identical either way (threefry counter mode
    # depends only on element count).
    if len(batch_shape) != 1:
        origin = origin.reshape(-1, 3)
        direction = direction.reshape(-1, 3)
    # Large-scene tile ordering (scene.tile_hint): permute (…, rows, W)
    # batches so each 512-lane kernel block is a 16×32-pixel image tile
    # — block cull frustums become compact instead of scene-spanning
    # rows (100% → ~50% active pairs at the primary bounce; +56% fwd at
    # L=256 depth 4, neutral at depth 16 — tools/cull_stats.py +
    # scale_bench A/B, round 5).  Ray order is estimator-neutral
    # (counter-mode RNG keys by lane); the radiance inverse-permutes
    # before the final reshape.  Estimates CHANGE (different RNG lane
    # assignment) only for scenes on this path.
    # depth gate: at production depth (16) compaction dominates and the
    # permute gathers measured −13% (202.0 vs 236.5 at L=256 d16); the
    # +41% win lives at shallow depth where primaries dominate (65.0 vs
    # 44.3 fwd at d4 through this in-trace path)
    tile_inv = None
    if (scene.tile_hint and depth <= 8 and len(batch_shape) >= 2
            and batch_shape[-2] % 16 == 0 and batch_shape[-1] % 32 == 0):
        rows_t, w_t = batch_shape[-2], batch_shape[-1]
        lead = 1
        for s in batch_shape[:-2]:
            lead *= s
        perm = np.arange(lead * rows_t * w_t).reshape(
            lead, rows_t // 16, 16, w_t // 32, 32).transpose(
            0, 1, 3, 2, 4).reshape(-1)
        tile_inv = jnp.asarray(np.argsort(perm))
        perm = jnp.asarray(perm)
        origin = origin[perm]
        direction = direction[perm]
    if manual_vjp is None:
        manual_vjp = scene.hit_fn is not None and scene.hit_replay_fn is not None

    if manual_vjp:
        if scene._manual_bounce is None:
            scene._manual_bounce = _make_manual_bounce(scene)
        bounce_step = scene._manual_bounce

        def bounce(carry, xs):
            bounce_idx, u_coin, u3 = xs
            o, d, throughput, strength, alive = carry
            k = rng.fold(key, bounce_idx)
            out, ys = bounce_step(params, o, d, throughput, strength, alive,
                                  k, bounce_idx < depth, u_coin, u3)
            return out, ys

        def phase_xs(start, end, width):
            """All of a phase's threefry draws in one pre-scan region —
            the same values the bounce would draw itself (fold(key, b)
            then streams 1 and 2), batched so the scan body contains no
            threefry fusion islands (bit-identical output).  vmap over
            the stacked per-bounce keys fuses the whole phase into ONE
            threefry dispatch per stream — per-bounce uniform calls cost
            ~100× their arithmetic in fusion overhead (draws_only was
            1.56 ms of the 7.1 ms bench-chunk forward,
            tools/step_breakdown.py) — while vmap of jax.random is
            value-identical to the per-key calls."""
            ks = jnp.stack([rng.fold(key, b) for b in range(start, end)])
            u_coins = jax.vmap(
                lambda kb: jax.random.uniform(rng.fold(kb, 1), (width,)))(ks)
            u3s = jax.vmap(
                lambda kb: jax.random.uniform(rng.fold(kb, 2),
                                              (width, 3)))(ks)
            return (jnp.arange(start, end), u_coins, u3s)
    else:
        def bounce(carry, bounce_idx):
            o, d, throughput, strength, alive = carry
            k = rng.fold(key, bounce_idx)
            out, dec = _bounce_live(scene, params, o, d, throughput,
                                    strength, alive, k,
                                    bounce_idx < depth, use_fused=False)
            sg = jax.lax.stop_gradient
            ys = jnp.concatenate(
                [sg(o + dec["t"][..., None] * d), throughput,
                 sg(jnp.stack([dec["mat_id"].astype(jnp.float32),
                               (alive & dec["hit"]).astype(jnp.float32)],
                              axis=-1))], axis=-1)
            return out, ys
        if remat:
            bounce = jax.checkpoint(bounce)  # O(1) residuals/bounce

    B = origin.shape[0]
    init = (
        origin,
        direction,
        jnp.ones((B, 3), jnp.float32),
        jnp.ones((B,), jnp.float32),
        jnp.ones((B,), bool),
    )

    if compact is None:
        compact = B >= _COMPACT_MIN_BATCH and depth >= 8
    phases = [(0, 1)]
    if compact:
        phases += [(s, dv) for s, dv in _COMPACT_SCHEDULE
                   if s <= depth and B // dv >= 1]

    # emission routing decisions (also consumed by the post-scan block)
    term_chains = getattr(scene.material_fn, "terminal_dynamic_emissive",
                          [])
    if skysel is None:
        skysel = os.environ.get("PTX_SKYSEL", "1") != "0"
    use_skysel = scene.emission_fn is None and term_chains and skysel
    dyn_mis = set(scene.material_fn.dynamic_slots["emissive"])
    term_mis = {mi for mi, _ in term_chains}
    mat_sum = use_skysel and dyn_mis <= term_mis
    # PTX_INSCAN=1: accumulate emission in the scan CARRY (per-phase
    # mat-sum + running sky-select) instead of emitting per-bounce ys
    # rows — removes the scan's dynamic_update_slice outputs and the
    # post-scan slice/transpose machinery.  Only valid in the mat_sum
    # regime (every dynamic emissive chain terminal).  A measured
    # NEGATIVE on the demo bench (347.6 vs 377.7 Mrays/s fwd+bwd): the
    # 12 extra carry columns ride the whole forward AND the scan's
    # reverse pass saves the wrapper's residuals per bounce — costlier
    # than the ys outputs they replace.  Kept behind the flag as the
    # recorded measurement.
    use_inscan = mat_sum and os.environ.get("PTX_INSCAN", "0") == "1"
    if mat_sum:
        const_rows_em = np.asarray(
            scene.material_fn.const_idx["emissive"])

    if use_inscan:
        inner_bounce = bounce

        def bounce(carry_ext, xs):
            core, acc, skyrows, hases = carry_ext
            core2, ys = inner_bounce(core, xs)
            live = ys[:, 7] > 0.5
            mid = ys[:, 6]
            thr = ys[:, 3:6]
            for m in range(scene.material_fn.n_materials):
                if m in term_mis:
                    continue
                acc = acc + jnp.where(
                    (live & (mid == float(m)))[:, None], thr,
                    0.0) * params["const"][int(const_rows_em[m])]
            thr_nz = jnp.sum(jnp.abs(thr), axis=-1) > 0.0
            skyrows = list(skyrows)
            hases = list(hases)
            for ti, (mi, _fn) in enumerate(term_chains):
                is_sel = live & (mid == float(mi)) & thr_nz
                skyrows[ti] = jnp.where(is_sel[:, None], ys, skyrows[ti])
                hases[ti] = hases[ti] | is_sel
            return (core2, acc, tuple(skyrows), tuple(hases)), None

    carry = init
    orig_idx = jnp.arange(B, dtype=jnp.int32)
    radiance = jnp.zeros((B, 3), jnp.float32)
    saved = []                       # (ys, orig_idx) per phase
    for pi, (start, div) in enumerate(phases):
        end = phases[pi + 1][0] if pi + 1 < len(phases) else depth + 1
        if pi > 0:
            carry, orig_idx = _compact_wavefront(
                carry, orig_idx, B // div,
                key=rng.fold(key, 0x00C0, pi))
        xs = (phase_xs(start, end, B // div) if manual_vjp
              else jnp.arange(start, end))
        if use_inscan:
            Bp = carry[0].shape[0]
            zero_row = jnp.zeros((Bp, 8), jnp.float32)
            ext = (carry,
                   jnp.zeros((Bp, 3), jnp.float32),
                   tuple(zero_row for _ in term_chains),
                   tuple(jnp.zeros((Bp,), bool) for _ in term_chains))
            (carry, acc, skyrows, hases), _ = jax.lax.scan(
                bounce, ext, xs)
            # bank the phase: sky chains eval on the selected rows
            contrib = acc
            for ti, (mi, fn) in enumerate(term_chains):
                em = fn(params, jax.lax.stop_gradient(skyrows[ti][:, 0:3]))
                contrib = contrib + jnp.where(
                    hases[ti][:, None], skyrows[ti][:, 3:6] * em, 0.0)
            if pi == 0:
                radiance = radiance + contrib
            else:
                radiance = radiance.at[jnp.clip(orig_idx, 0, B - 1)].add(
                    jnp.where((orig_idx < B)[:, None], contrib, 0.0),
                    indices_are_sorted=True)
        else:
            carry, ys = jax.lax.scan(bounce, carry, xs)
            saved.append((ys, orig_idx))

    if use_inscan:
        if tile_inv is not None:
            radiance = radiance[tile_inv]
        return radiance.reshape(batch_shape + (3,))

    # ALL phases' emission in ONE texture evaluation (and, in reverse
    # mode, one image-gradient histogram + one const-table transpose):
    # phase lane blocks concatenate into a single flat batch.  Plain
    # autodiff handles the emissive parameter gradients here; the bounce
    # custom-VJP never sees them.
    #
    # Sky-select path (reference-scale probes): when the scene has
    # terminal dynamic-emissive materials (reflect ≡ transmit ≡ 0 — the
    # sky enclosure, test.cpp:134-140) and no fused emission kernel
    # (images past the VMEM budget fall off it), each such chain is
    # evaluated on ONE bounce-selected lane per (phase, path) instead of
    # every post-scan lane: a terminal hit zeroes throughput exactly, so
    # at most one bounce per path has (mat terminal ∧ thr ≠ 0) — the
    # select is exact, cuts the image gather AND its TPU scatter-add
    # transpose from Σ nb·Bp (~5.4·B) to Σ Bp (~1.6·B) rows, and runs as
    # a one-hot sum over the short bounce axis (no sort, no scatter).
    # (term_chains / use_skysel / mat_sum / const_rows_em were decided
    # above the scan — the in-scan path consumed them there.)
    #
    # mat-sum fast path: when every dynamic emissive chain is terminal
    # (handled by sky-select), the base emission is a pure const-table
    # function of mat_id — so instead of a per-LANE table gather + a
    # select chain over every post-scan lane (~0.7 + 0.8 ms at 700k
    # lanes, 3k profile) plus their one-hot-matmul transposes, fold the
    # throughput sum per MATERIAL (M masked reduces, all elementwise)
    # and multiply by the const rows once: contrib += Σ_m row_m · Σ_b
    # where(live ∧ mid=m, thr).  Gradients: d row_m is a plain reduce,
    # d thr a broadcast — no gathers, no scatters, no MXU transposes.
    if mat_sum:
        em_cat = None
    else:
        if use_skysel:
            em_eval = scene.material_fn.eval_emissive_base
        else:
            em_eval = scene.emission_fn or scene.material_fn.eval_emissive
        ys_cat = jnp.concatenate([ys.reshape(-1, 8) for ys, _ in saved])
        # pos re-enters stop_gradient HERE: the packed ys is
        # differentiable as a whole (thr columns), so a bare pos slice
        # would re-open a pos cotangent chain through the emission trig —
        # wasted transposes over every post-scan lane (d emissive/d pos
        # ≡ 0 through nearest gathers)
        em_cat = em_eval(
            params, jax.lax.stop_gradient(ys_cat[:, 0:3]),
            jax.lax.stop_gradient(ys_cat[:, 6]).astype(jnp.int32))

    sky_rows = []      # per phase: per terminal chain: (row (Bp, 8), has)
    sky_em = []        # per terminal chain: (ΣBp, 3) eval, split per phase
    # PTX_SKYMERGE=1 merges the per-phase selected rows into a per-path
    # (B, 8) buffer before the image eval — a measured NEGATIVE result
    # (3k bench 209.9 → 154.7 Mrays/s): the (len(phases)−1) row
    # scatter-sets cost more than evaluating/transposing the extra
    # 0.4·B rows.  Kept off; the flag preserves the measurement.
    sky_merged = (use_skysel and len(saved) > 1
                  and os.environ.get("PTX_SKYMERGE", "0") == "1")
    if use_skysel:
        for ys, _ in saved:
            nb, Bp, _ = ys.shape
            mid = ys[..., 6]
            live = ys[..., 7] > 0.5
            thr_nz = jnp.sum(jnp.abs(ys[..., 3:6]), axis=-1) > 0.0
            per_chain = []
            for mi, _fn in term_chains:
                is_sel = live & (mid == float(mi)) & thr_nz
                first = jnp.argmax(is_sel, axis=0)               # (Bp,)
                oh = (jax.lax.broadcasted_iota(jnp.int32, (nb, Bp), 0)
                      == first[None, :])
                row = jnp.sum(jnp.where(oh[..., None], ys, 0.0), axis=0)
                per_chain.append((row, jnp.any(is_sel, axis=0)))
            sky_rows.append(per_chain)
        if sky_merged:
            # cross-phase merge: a path's terminal hit lives in exactly
            # ONE phase (terminality again), so the per-phase selected
            # rows merge collision-free into a per-PATH (B, 8) buffer by
            # orig index — the image chain and its binned transpose then
            # run on B rows instead of Σ Bp ≈ 1.4·B, and the sky
            # contribution adds to radiance directly (phase-0 indexing)
            # with no extra scatter.  The merge itself is
            # (len(phases)−1) small row scatters of ~B/3 + B/16 rows.
            for ti, (mi, fn) in enumerate(term_chains):
                row0, has0 = sky_rows[0][ti]
                buf = jnp.concatenate(
                    [row0, jnp.zeros((1, 8), jnp.float32)])   # + drop row
                hasb = jnp.concatenate(
                    [has0, jnp.zeros((1,), bool)])
                for pi in range(1, len(saved)):
                    row, has = sky_rows[pi][ti]
                    orig = saved[pi][1]
                    sel = has & (orig < B)
                    tgt = jnp.where(sel, jnp.clip(orig, 0, B - 1), B)
                    buf = buf.at[tgt].set(row)
                    hasb = hasb.at[tgt].set(sel)
                em = fn(params, jax.lax.stop_gradient(buf[:B, 0:3]))
                radiance = radiance + jnp.where(
                    hasb[:B, None], buf[:B, 3:6] * em, 0.0)
        else:
            for ti, (mi, fn) in enumerate(term_chains):
                pos_cat = jnp.concatenate(
                    [sky_rows[pi][ti][0][:, 0:3]
                     for pi in range(len(saved))])
                sky_em.append(fn(params, jax.lax.stop_gradient(pos_cat)))

    ofs = 0
    sky_ofs = [0] * len(term_chains)
    for pi, (ys, orig) in enumerate(saved):
        nb, Bp, _ = ys.shape
        thr = ys[..., 3:6]
        live = ys[..., 7] > 0.5
        if mat_sum:
            mid = ys[..., 6]
            contrib = jnp.zeros((Bp, 3), jnp.float32)
            for m in range(scene.material_fn.n_materials):
                if m in term_mis:
                    continue        # terminal mats ride sky-select below
                wsum = jnp.sum(
                    jnp.where((live & (mid == float(m)))[..., None],
                              thr, 0.0), axis=0)
                contrib = contrib + wsum * params["const"][
                    int(const_rows_em[m])]
        else:
            em = em_cat[ofs:ofs + nb * Bp].reshape(nb, Bp, 3)
            ofs += nb * Bp
            contrib = jnp.sum(jnp.where(live[..., None], thr * em, 0.0),
                              axis=0)
        if use_skysel and not sky_merged:
            for ti in range(len(term_chains)):
                row, has = sky_rows[pi][ti]
                em_t = sky_em[ti][sky_ofs[ti]:sky_ofs[ti] + Bp]
                sky_ofs[ti] += Bp
                contrib = contrib + jnp.where(
                    has[..., None], row[:, 3:6] * em_t, 0.0)
        if pi == 0:
            radiance = radiance + contrib
        else:
            # orig is strictly increasing over kept lanes (compaction
            # packs in lane order) and the clipped drop-sentinel tail is a
            # constant B−1, so the index vector is nondecreasing —
            # indices_are_sorted lets XLA skip the scatter sort phase.
            # unique_indices would NOT be honest: the clipped sentinels
            # duplicate B−1 (their added value is 0, but the promise is
            # about indices).
            radiance = radiance.at[jnp.clip(orig, 0, B - 1)].add(
                jnp.where((orig < B)[..., None], contrib, 0.0),
                indices_are_sorted=True)
    if tile_inv is not None:
        radiance = radiance[tile_inv]
    return radiance.reshape(batch_shape + (3,))
