"""On-chip golden job (VERDICT r2 #7): the routine TPU regression the
CPU goldens can't provide.

1. Runs the fused-vs-unfused trace_rays agreement check on hardware
   (the same assertion as tests/test_bounce_kernel.py::
   test_fused_trace_rays_tpu, which is skipped off-TPU and so never runs
   in the CPU suite) — a regression in the bounce/emission/fasthit
   kernels fails HERE, not only in the manual parity harness.
2. Renders a small fixed-key frame through the PRODUCTION TPU path
   (fused kernels + compaction + manual VJP bench config) and prints a
   content digest.  The digest recorded in STATUS.md pins the on-chip
   output; exact reproduction requires the same libtpu/toolchain, so
   treat digest drift across toolchains as "inspect", and the
   fused-vs-unfused check (step 1) as the hard gate.

Run: python tools/tpu_golden.py      (exit 1 on any failure)

Round 4: the gates are also a ROUTINE flow — ``bench.py`` imports
:func:`run_golden` and fails loudly before reporting a benchmark number
(VERDICT r3 #4a), so a Pallas-kernel regression can no longer ship
behind a green CPU suite.
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_golden():
    """Run the on-chip gates; returns the result dict, raises on failure."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ptx.integrate import trace as tr
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.scenes.builders import make_world
    from ptx.utils.profiling import log

    assert jax.default_backend() == "tpu", "tpu_golden needs the chip"

    # --- 1. fused vs unfused agreement (hard gate) ---------------------
    os.environ["PTX_FUSED"] = "1"
    scene_f = tr.compile_scene(make_world())
    # round 3: the demo's emission defaults to sky-select + mat-sum (all
    # dynamic chains terminal) — faster than the fused emission kernel;
    # the kernel itself is gated separately below under PTX_EMK=1
    assert scene_f.bounce_fn is not None
    os.environ["PTX_FUSED"] = "0"
    scene_u = tr.compile_scene(make_world())
    assert scene_u.bounce_fn is None
    os.environ.pop("PTX_FUSED", None)

    B = 8192
    rng = np.random.default_rng(3)
    d = np.stack([rng.uniform(-0.6, 0.6, B), rng.uniform(-0.6, 0.6, B),
                  -np.ones(B)], -1).astype(np.float32)
    o = jnp.zeros((B, 3), jnp.float32)
    d = jnp.asarray(d)
    key = jax.random.PRNGKey(11)

    # depth 0 = primary hit + emission only: no stochastic decisions.
    # The in-kernel hit agrees with the standalone hit kernel EXACTLY
    # (verified: 0 mat/t/evt mismatches at B=8192), so the only
    # legitimate per-lane divergence is a texel flip where the Mosaic
    # _acos approximation lands a direction on the other side of a texel
    # boundary than XLA's transcendentals — measured ~0.6% of lanes on
    # the demo (visible because the sun gradient is steep).  Gates:
    # p99 of per-lane relative error must be fp-tight (catches
    # whole-population bugs — this is the gate that caught the round-2
    # bf16 hi/lo folding: 74% of lanes at ~0.4% error), and the flip
    # fraction bounded.
    rf0 = np.asarray(jax.jit(lambda p: tr.trace_rays(
        scene_f, p, o, d, key, 0, compact=False))(scene_f.params))
    ru0 = np.asarray(jax.jit(lambda p: tr.trace_rays(
        scene_u, p, o, d, key, 0, compact=False))(scene_u.params))
    rel0 = np.abs(rf0 - ru0).max(-1) / max(np.abs(ru0).max(), 1e-9)
    p99 = float(np.percentile(rel0, 99))
    flip_frac = float((rel0 > 1e-3).mean())
    log("tpu_golden_depth0", p99_rel=p99, flip_frac=round(flip_frac, 5))
    assert p99 < 1e-4, f"depth-0 p99 divergence {p99}"
    assert flip_frac < 0.02, f"depth-0 texel-flip fraction {flip_frac}"
    err0 = p99

    # deep paths: 1-ulp differences in kernel-vs-XLA transcendentals can
    # flip a branch coin or a texel at a rounding boundary, after which
    # that lane's PATH legitimately decorrelates — so the deep gate is
    # statistical: few divergent lanes, matching means
    rf = np.asarray(jax.jit(lambda p: tr.trace_rays(
        scene_f, p, o, d, key, 8, compact=False))(scene_f.params))
    ru = np.asarray(jax.jit(lambda p: tr.trace_rays(
        scene_u, p, o, d, key, 8, compact=False))(scene_u.params))
    frac = float((np.abs(rf - ru).max(-1) > 1e-3).mean())
    mean_rel = abs(rf.mean() - ru.mean()) / ru.mean()
    log("tpu_golden_depth8", divergent_lane_frac=round(frac, 5),
        mean_rel=float(mean_rel))
    assert frac < 0.02, f"depth-8 divergent lanes {frac}"
    assert mean_rel < 5e-3, f"depth-8 mean divergence {mean_rel}"
    err = max(err0, frac)

    # --- 2. fixed-key production render digest --------------------------
    cam = Camera.reference_demo(128, 128)
    ys = jnp.arange(128)
    o2, d2 = sample_rays(cam, key, ys, jnp.arange(128), 4)

    @jax.jit
    def frame(p):
        rad = tr.trace_rays(scene_f, p, o2.reshape(-1, 3),
                            d2.reshape(-1, 3), key, 16, compact=True)
        return jnp.mean(rad.reshape(4, 128, 128, 3), axis=0)

    arr = np.asarray(frame(scene_f.params), np.float32)
    digest = hashlib.sha256(np.round(arr, 4).tobytes()).hexdigest()[:16]
    log("tpu_golden_render", mean=float(arr.mean()),
        digest=digest, shape=list(arr.shape))
    assert np.isfinite(arr).all(), "render digest frame has non-finite pixels"

    # --- 3. megasweep-vs-fixpoint agreement (large-scene production) ----
    # The megasweep kernel is the production first hit for big scenes and
    # its CPU tests run interpret-mode only — a Mosaic lowering bug would
    # pass the whole suite.  Gate: flipped-lane fraction on hardware
    # bounded at the diagnosed boundary-rounding level
    # (tools/mega_check.py round 4: 0.11% grazing/corner flips).
    from ptx.geom.fasthit import compile_fast_hit
    from ptx.scenes.builders import stress_spheres
    scene_s = tr.compile_scene(stress_spheres(57))
    fixh = compile_fast_hit(scene_s.plan, sweep=True, sweep_mode="fixpoint")
    megah = compile_fast_hit(scene_s.plan, sweep=True, sweep_mode="mega",
                             params_ref=scene_s.params)
    g = np.random.default_rng(7)
    Bm = 8192
    om = jnp.asarray(np.stack([g.uniform(-8, 8, Bm),
                               g.uniform(-1.2, 4, Bm),
                               g.uniform(-8, 8, Bm)], -1), jnp.float32)
    dm = g.normal(size=(Bm, 3)).astype(np.float32)
    dm = jnp.asarray(dm / np.linalg.norm(dm, axis=1, keepdims=True))
    hf = jax.jit(lambda p: fixh(p, om, dm))(scene_s.params)
    hm = jax.jit(lambda p: megah(p, om, dm))(scene_s.params)
    mega_flip = max(float((np.asarray(hf[k]) != np.asarray(hm[k])).mean())
                    for k in ("hit", "entering", "_evt", "mat_id"))
    assert np.isfinite(np.asarray(hm["t"])).all()
    assert np.isfinite(np.asarray(hm["normal"])).all()
    log("tpu_golden_megasweep", flip_frac=round(mega_flip, 5))
    # bit-exact since the round-5 bf16 plane-interval fix (README delta
    # 8 history); the bound keeps headroom for toolchain fma drift only,
    # and tools/mega_check.py's f64 class-aware gate is the strict check
    assert mega_flip < 1e-3, f"megasweep flip fraction {mega_flip}"

    # --- 4. fused mega bounce + row-fed replay backward (round 4) ------
    # scene_s compiled above with the defaults = fused mega bounce
    # forward + row-fed replay-bwd kernel; the A/B scene disables the
    # fused forward (PTX_MEGAB=0) so the whole shade/scatter path runs
    # in XLA.  Both run the same trace on hardware; the loss agreed
    # bit-exactly and Σ|g| to ≤9e-8 when built (B=65k, depth 6) — gate
    # at 1e-5 for headroom.  This is the only routine check of the mega
    # bounce's Mosaic lowering (CPU tests are interpret-mode).
    assert scene_s.bounce_fn is not None, "mega fused bounce not built"
    os.environ["PTX_MEGAB"] = "0"
    scene_su = tr.compile_scene(stress_spheres(57))
    os.environ.pop("PTX_MEGAB", None)
    assert scene_su.bounce_fn is None

    def mb_loss(sc):
        def loss(p):
            # compact=True FORCED (B=8192 is below the auto threshold):
            # compaction filler lanes are the shape that NaN'd the
            # replay backward's d(ior) on its first compacted hardware
            # run (round 4 — the arg==0 refract-gradient fix in
            # bounce_kernel.replay_lane_math); this gate keeps the
            # {compaction × kernel backward} combination covered.
            return jnp.mean(tr.trace_rays(sc, p, om, dm, key, 8,
                                          compact=True))
        v, gr = jax.jit(jax.value_and_grad(loss))(sc.params)
        gsum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(gr))
        return float(v), gsum

    vf, gf = mb_loss(scene_s)
    vu, gu = mb_loss(scene_su)
    mb_loss_rel = abs(vf - vu) / max(abs(vu), 1e-9)
    mb_gsum_rel = abs(gf - gu) / max(abs(gu), 1e-9)
    log("tpu_golden_mega_bounce", loss_rel=mb_loss_rel,
        gsum_rel=mb_gsum_rel)
    assert np.isfinite(vf) and np.isfinite(gf)
    assert mb_loss_rel < 1e-5, f"mega-bounce loss divergence {mb_loss_rel}"
    assert mb_gsum_rel < 1e-5, f"mega-bounce grad divergence {mb_gsum_rel}"

    # --- 5. composed workload class: big CSG under an HDR probe --------
    # The reference demo's real scene shape (test.cpp:123,134-140) — the
    # megasweep + fused mega bounce + compaction + sky-select + binned
    # image-gradient histogram all in ONE program (VERDICT r4 #1).  Gate:
    # fused-vs-unfused loss/grad agreement (same class as gate 4) PLUS a
    # nonzero, finite sky-image cotangent through the whole stack.
    from ptx.scenes.builders import procedural_sky_image
    sky_img = procedural_sky_image(192, 384)
    scene_c = tr.compile_scene(stress_spheres(57, sky_image=sky_img))
    assert scene_c.bounce_fn is not None, "composed mega bounce not built"
    os.environ["PTX_MEGAB"] = "0"
    scene_cu = tr.compile_scene(stress_spheres(57, sky_image=sky_img))
    os.environ.pop("PTX_MEGAB", None)

    def comp_loss(sc):
        def loss(p):
            return jnp.mean(tr.trace_rays(sc, p, om, dm, key, 8,
                                          compact=True))
        v, gr = jax.jit(jax.value_and_grad(loss))(sc.params)
        gsum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(gr))
        img_g = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree.leaves(gr["images"]))
        return float(v), gsum, img_g

    vc, gc, ic = comp_loss(scene_c)
    vcu, gcu, icu = comp_loss(scene_cu)
    comp_loss_rel = abs(vc - vcu) / max(abs(vcu), 1e-9)
    comp_gsum_rel = abs(gc - gcu) / max(abs(gcu), 1e-9)
    log("tpu_golden_composed", loss_rel=comp_loss_rel,
        gsum_rel=comp_gsum_rel, sky_img_gsum=ic)
    assert np.isfinite(vc) and np.isfinite(gc)
    assert ic > 0.0, "composed scene: sky image received no gradient"
    assert comp_loss_rel < 1e-5, f"composed loss divergence {comp_loss_rel}"
    assert comp_gsum_rel < 1e-4, f"composed grad divergence {comp_gsum_rel}"

    return {"depth0_rel_err": float(err0),
            "depth8_divergent_frac": frac,
            "render_digest": digest,
            "megasweep_flip_frac": round(mega_flip, 5),
            "mega_bounce_loss_rel": mb_loss_rel,
            "mega_bounce_gsum_rel": mb_gsum_rel,
            "composed_loss_rel": comp_loss_rel,
            "composed_gsum_rel": comp_gsum_rel,
            "render_mean": round(float(arr.mean()), 6)}


def main():
    print(json.dumps(run_golden()))


if __name__ == "__main__":
    main()
