"""Reconcile bench.py's chained-dispatch rays/s with end-to-end wall clock.

VERDICT r2 weak #2: the chained bench said ~508 Mrays/s forward while a
host-loop full-frame render said ~156 wall — a 3.3x gap that must be
attributed before either number is trustworthy.  Hypotheses:

  H1 device is the bottleneck and the chain under-counts device work
     (chain number inflated)
  H2 per-dispatch host/tunnel overhead dominates the host loop
     (wall number deflated; device idles between dispatches)

Decisive test: put the WHOLE frame inside one jit as a lax.fori_loop
over (sample, band) steps — one dispatch, one fetch, no per-chunk host
anything.  If its rays/s matches the chain, H2; if it matches the host
loop, H1.

Run on the real chip:  python tools/wall_experiments.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(width=512, height=512, spp=64, depth=16):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ptx.core import rng as prng
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.integrate.trace import compile_scene, trace_rays
    from ptx.scenes.builders import make_world
    from ptx.utils.profiling import log

    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    scene = compile_scene(make_world())
    cam = Camera.reference_demo(width, height)
    key = jax.random.PRNGKey(0)
    rows = height // 2
    n_bands = height // rows
    rays = width * height * spp * (depth + 1)

    # ---- variant A: whole frame in ONE dispatch (device fori_loop) ----
    @jax.jit
    def frame_one_dispatch(params, key):
        def body(i, acc):
            s = i // n_bands
            b = i % n_bands
            y0 = b * rows
            k = prng.fold(key, s, y0)
            ys = y0 + jnp.arange(rows)
            o, d = sample_rays(cam, k, ys, jnp.arange(width), 1)
            rad = trace_rays(scene, params, o, d, k, depth, remat=False)
            band = jnp.mean(rad, axis=0)  # (rows, W, 3)
            return jax.lax.dynamic_update_slice(
                acc, acc_slice(acc, y0) + band[None], (0, y0, 0, 0))

        def acc_slice(acc, y0):
            return jax.lax.dynamic_slice(
                acc, (0, y0, 0, 0), (1, rows, width, 3))[0]

        acc = jnp.zeros((1, height, width, 3), jnp.float32)
        acc = jax.lax.fori_loop(0, spp * n_bands, body, acc)
        return acc[0] / spp

    t0 = time.perf_counter()
    frame = np.asarray(frame_one_dispatch(scene.params, key))
    t_compile_and_run = time.perf_counter() - t0
    log("one_dispatch_cold", seconds=round(t_compile_and_run, 2))

    t0 = time.perf_counter()
    frame = np.asarray(frame_one_dispatch(scene.params, key))
    dt = time.perf_counter() - t0
    assert np.isfinite(frame).all()
    log("one_dispatch_frame", seconds=round(dt, 3),
        mrps=round(rays / dt / 1e6, 2))

    # ---- variant B: host loop, band accumulators (bench.py's check) ----
    @jax.jit
    def band_step(params, key, acc, s, y0):
        k = prng.fold(key, s, y0)
        ys = y0 + jnp.arange(rows)
        o, d = sample_rays(cam, k, ys, jnp.arange(width), 1)
        rad = trace_rays(scene, params, o, d, k, depth, remat=False)
        return acc + jnp.mean(rad, axis=0)

    accs = [jnp.zeros((rows, width, 3), jnp.float32) for _ in range(n_bands)]
    jax.block_until_ready(band_step(scene.params, key, accs[0],
                                    jnp.int32(0), jnp.int32(0)))
    t0 = time.perf_counter()
    for s in range(spp):
        for b in range(n_bands):
            accs[b] = band_step(scene.params, key, accs[b],
                                jnp.int32(s), jnp.int32(b * rows))
    frame2 = np.asarray(jnp.concatenate(accs, axis=0) / spp)
    dt_b = time.perf_counter() - t0
    log("host_loop_frame", seconds=round(dt_b, 3),
        mrps=round(rays / dt_b / 1e6, 2))

    # ---- variant C: host loop, scalar outputs (bench chain shape) ----
    @jax.jit
    def scalar_step(params, key, acc, s, y0):
        k = prng.fold(key, s, y0)
        ys = y0 + jnp.arange(rows)
        o, d = sample_rays(cam, k, ys, jnp.arange(width), 1)
        rad = trace_rays(scene, params, o, d, k, depth, remat=False)
        return acc + jnp.mean(rad)

    acc = jnp.float32(0.0)
    jax.block_until_ready(scalar_step(scene.params, key, acc,
                                      jnp.int32(0), jnp.int32(0)))
    t0 = time.perf_counter()
    for s in range(spp):
        for b in range(n_bands):
            acc = scalar_step(scene.params, key, acc,
                              jnp.int32(s), jnp.int32(b * rows))
    _ = float(acc)
    dt_c = time.perf_counter() - t0
    log("host_loop_scalar", seconds=round(dt_c, 3),
        mrps=round(rays / dt_c / 1e6, 2))

    # ---- variant D: host loop, constants baked per-call like bench ----
    # bench.py folds i inside jit but passes y0/i as device scalars the
    # same way; the only remaining difference vs C is the fold arity.
    print("done")


if __name__ == "__main__":
    main()
