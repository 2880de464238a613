"""Fused-path fwd+bwd cost breakdown at the bench configuration.

The round-2 production step is: fused bounce megakernel forward + fused
replay-VJP backward kernel + post-scan phase emission (XLA) + dead-lane
compaction.  The older ablation tools (fwd_breakdown / bwd_ablate) patch
the UNFUSED XLA composition, so this tool ablates the production path
directly, by severing specific gradient paths / subsystems:

- full        : value_and_grad of the bench chunk loss (the headline op)
- fwd         : forward only
- no_img_grad : sky image array frozen (kills the image scatter-add bwd)
- no_geom_grad: geometry leaves frozen (sphere/plane/ior cotangents off)
- no_mat_grad : material const table frozen
- no_compact  : full grad, dead-lane compaction disabled
- unfused     : full grad with PTX_FUSED=0 (XLA bounce + replay VJP)

Timing: dependent-dispatch chain (each iteration's params are nudged by
the previous grads) ending in a scalar fetch — block_until_ready is not
a trustworthy barrier on this backend below ~1 s aggregates (see
tools/roofline.py), and chained dependence defeats pipelining.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ["full", "fwd", "no_img_grad", "no_geom_grad", "no_mat_grad",
         "no_compact", "no_rng", "const_sky", "const_sky_fwd",
         "no_emission", "no_emission_fwd", "draws_only"]

GEOM_KEYS = ("sphere_center", "sphere_radius", "plane_normal", "plane_d",
             "xform", "ior")


def build(mode, scene, cam, spp_chunk=1, rows=128, width=512, depth=16):
    import jax
    import jax.numpy as jnp
    from ptx.core import rng as prng
    from ptx.integrate.camera import sample_rays
    from ptx.integrate.trace import trace_rays

    sg = jax.lax.stop_gradient

    if mode == "no_rng":
        # timing-only semantics change: stub every uniform draw (kills the
        # threefry chains in phase_xs AND the camera jitter)
        import jax.random as jrandom
        real_uniform = jrandom.uniform

        def stub_uniform(key, shape=(), dtype=jnp.float32, minval=0.0,
                         maxval=1.0):
            del key
            return jnp.full(shape, 0.4321 * (minval + maxval) + 0.1,
                            jnp.float32).astype(dtype)
        jrandom.uniform = stub_uniform
        jax.random.uniform = stub_uniform

    if mode in ("no_emission", "no_emission_fwd"):
        # stub the emissive chain (gather + equirect trig + table row):
        # what remains is the bounce kernels, compaction, threefry, glue
        real_em = scene.material_fn.eval_emissive
        scene.material_fn.eval_emissive = (
            lambda params, pos, mid: jnp.zeros(pos.shape[:-1] + (3,)))

    if mode == "draws_only":
        # just the pre-scan threefry batches of the bench chunk's phases
        B, depth_ = rows * width * spp_chunk, depth
        phases = [(0, 1), (2, 3), (6, 16)]

        def draws(key, i):
            key = prng.fold(key, i)
            tot = jnp.float32(0)
            for pi, (start, div) in enumerate(phases):
                end = phases[pi + 1][0] if pi + 1 < len(phases) else depth_ + 1
                w = B // div
                for b in range(start, end):
                    kb = prng.fold(key, b)
                    tot += jnp.sum(jax.random.uniform(prng.fold(kb, 1), (w,)))
                    tot += jnp.sum(jax.random.uniform(prng.fold(kb, 2),
                                                      (w, 3)))
            return tot
        f = jax.jit(draws)

        def step(state):
            params, key, i = state
            v = f(key, i)
            return (params, key, i + (v == v).astype(jnp.int32))
        return step, rows * width * spp_chunk * (depth + 1)

    def chunk_loss(params, key, i):
        key = prng.fold(key, i)
        if mode == "no_img_grad":
            params = dict(params, images=[sg(im) for im in params["images"]])
        elif mode == "no_geom_grad":
            params = dict(params, **{k: sg(params[k]) for k in GEOM_KEYS})
        elif mode == "no_mat_grad":
            params = dict(params, const=sg(params["const"]),
                          factor=sg(params["factor"]))
        ys = jnp.arange(rows)
        o, d = sample_rays(cam, key, ys, jnp.arange(width), spp_chunk)
        r = trace_rays(scene, params, o, d, key, depth, remat=False,
                       compact=None if mode != "no_compact" else False)
        return jnp.mean(r)

    if mode in ("fwd", "const_sky_fwd", "no_emission_fwd"):
        f = jax.jit(chunk_loss)

        def step(state):
            params, key, i = state
            v = f(params, key, i)
            # dependence: fold the loss into the key path via i
            return (params, key, i + (v == v).astype(jnp.int32))
    else:
        f = jax.jit(jax.value_and_grad(chunk_loss))

        def step(state):
            params, key, i = state
            v, g = f(params, key, i)
            # dependence: nudge a param leaf by the grads so the next
            # dispatch consumes this one's output
            params = dict(params,
                          const=params["const"] + 0.0 * g["const"])
            return (params, key, i + 1)

    rays = rows * width * spp_chunk * (depth + 1)
    return step, rays


def timed(step, state0, iters):
    import numpy as np
    state = step(state0)
    np.asarray(state[2])                       # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    np.asarray(state[2])                       # fetch = completion barrier
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ptx.integrate.camera import Camera
    from ptx.integrate.trace import compile_scene
    from ptx.scenes.builders import make_world

    modes = sys.argv[1:] or MODES
    scene = compile_scene(make_world())
    cam = Camera.reference_demo(512, 512)
    key = jax.random.PRNGKey(0)
    real_uniform = jax.random.uniform
    for mode in modes:
        use_scene = scene
        if mode in ("const_sky", "const_sky_fwd"):
            from tools.fwd_breakdown import make_world_const_sky
            use_scene = compile_scene(make_world_const_sky())
        real_em = use_scene.material_fn.eval_emissive
        try:
            step, rays = build(mode, use_scene, cam)
            dt = timed(step, (use_scene.params, key, jnp.int32(0)), iters=40)
        finally:
            jax.random.uniform = real_uniform
            import jax.random as jrandom
            jrandom.uniform = real_uniform
            use_scene.material_fn.eval_emissive = real_em
        print(json.dumps({"mode": mode,
                          "ms_per_chunk": round(dt * 1e3, 2),
                          "mrps": round(rays / dt / 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
