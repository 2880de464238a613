"""Speed-of-light / roofline measurement for the hot path (SURVEY §5.1,
VERDICT round-1 missing #5).

Empirical methodology (no spec-sheet numbers): measure this chip's
attainable VPU f32 throughput and HBM bandwidth with dedicated Pallas /
XLA microkernels, count the hit kernel's vector ops analytically, and
place the measured kernel on that roofline.  Results: docs/perf_roofline.md.

Timing discipline (cost an afternoon to learn): on this container's
remote-execution TPU backend, any dispatch shorter than ~10 ms cannot be
timed from the host — even *dependent* chains of sub-ms dispatches
under-report by orders of magnitude (completion signaling is coarse).
Only dispatches with ≥ ~10 ms of device work measure truthfully (the
end-to-end bench numbers cross-check against full-frame wall clock).
Every microbenchmark below therefore repeats its workload INSIDE one jit
(lax.scan / fori_loop over a dependent carry) until a single dispatch is
tens of milliseconds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_chain(step, x0, iters):
    import jax
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def measure_vpu_peak():
    """Quadratic-chain kernel (not algebraically foldable): attainable
    f32 VPU op rate.  K unrolled ops per element × R fori_loop reps keeps
    one dispatch at tens of ms."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 256          # unrolled per rep (compile stays fast)
    R = 1024         # dependent reps inside the kernel
    ROWS, LANES, GRID = 512, 128, 16

    def kernel(x_ref, o_ref):
        def body(_, x):
            c = jnp.float32(1e-9)
            for _i in range(K):
                x = x + x * x * c      # mul, mul, add
            return x
        o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel, grid=(GRID,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES),
                                           jnp.float32))(x)

    x = jnp.ones((GRID * ROWS, LANES), jnp.float32)
    dt = _timed_chain(run, x, 10)
    return GRID * ROWS * LANES * K * R * 3 / dt


def measure_hbm_bw():
    """Dependent copy chain over a 256 MB array: read+write bandwidth."""
    import jax
    import jax.numpy as jnp

    import jax.lax as lax

    x = jnp.ones((128 * 1024 * 1024 // 4,), jnp.float32)
    R = 32           # dependent full-array passes inside one dispatch

    @jax.jit
    def copy(x):
        return lax.scan(lambda c, _: (c * 1.0000001, 0.0), x, None,
                        length=R)[0]

    dt = _timed_chain(copy, x, 8)
    return 2 * x.size * 4 * R / dt


def measure_hit_kernel():
    """The production Pallas hit kernel, dependent-chained through a
    negligible origin perturbation."""
    import jax
    import jax.numpy as jnp
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.integrate.trace import compile_scene
    from ptx.geom.fasthit import collect_leaves
    from ptx.scenes.builders import make_world

    scene = compile_scene(make_world(), pallas=True)
    L = len(collect_leaves(scene.plan))
    cam = Camera.reference_demo(512, 512)
    key = jax.random.PRNGKey(0)
    o, d = sample_rays(cam, key, jnp.arange(256), jnp.arange(512), 1)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    B = o.shape[0]

    R = 64           # dependent kernel invocations inside one dispatch

    @jax.jit
    def step(o):
        def body(o, _):
            h = scene.hit_fn(scene.params, o, d)
            # dependency without changing the workload (eps 1e-12)
            return o + 1e-12 * h["t"][:, None], 0.0
        return jax.lax.scan(body, o, None, length=R)[0]

    dt = _timed_chain(step, o, 6)
    dt = dt / R

    # analytic vector-op count per ray (see docs/perf_roofline.md):
    n_nodes = 14
    per_ray = (25 * L + 2 * L * (6 * L + 2 * n_nodes + 10) + 15 * L)
    return {"B": B, "L": L, "seconds": dt,
            "rays_per_s": B / dt,
            "analytic_ops_per_ray": per_ray,
            "ops_per_s": B * per_ray / dt,
            "bytes_per_ray": 48,
            "bytes_per_s": B * 48 / dt}


def measure_trace_forward(compact):
    import jax
    import jax.numpy as jnp
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.integrate.trace import compile_scene, trace_rays
    from ptx.scenes.builders import make_world

    scene = compile_scene(make_world())
    cam = Camera.reference_demo(512, 512)
    key = jax.random.PRNGKey(0)
    o, d = sample_rays(cam, key, jnp.arange(256), jnp.arange(512), 1)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    depth = 16

    @jax.jit
    def step(o):
        r = trace_rays(scene, scene.params, o, d, key, depth,
                       compact=compact)
        return o + 1e-12 * r.sum(-1, keepdims=True)

    dt = _timed_chain(step, o, 40)
    B = o.shape[0]
    return {"B": B, "depth": depth, "compact": compact, "seconds": dt,
            "segments_per_s": B * (depth + 1) / dt}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    vpu = measure_vpu_peak()
    print(json.dumps({"vpu_f32_tops_per_s": round(vpu / 1e12, 3)}),
          flush=True)
    bw = measure_hbm_bw()
    print(json.dumps({"hbm_gb_per_s": round(bw / 1e9, 1)}), flush=True)
    hk = measure_hit_kernel()
    hk["vpu_utilization"] = round(hk["ops_per_s"] / vpu, 3)
    hk["hbm_utilization"] = round(hk["bytes_per_s"] / bw, 4)
    print(json.dumps(hk), flush=True)
    for compact in (False, True):
        tf = measure_trace_forward(compact)
        tf["hit_kernel_fraction_at_full_width"] = round(
            hk["seconds"] * (tf["depth"] + 1) / tf["seconds"], 3)
        print(json.dumps(tf), flush=True)


if __name__ == "__main__":
    main()
