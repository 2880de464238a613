"""Speed-of-light / roofline measurement for the hot path (SURVEY §5.1,
VERDICT round-1 missing #5).

Empirical methodology (no spec-sheet numbers): measure this chip's
attainable VPU f32 throughput and HBM bandwidth with dedicated Pallas /
XLA microkernels, count the hit kernel's vector ops analytically, and
place the measured kernel on that roofline.  Results: docs/perf_roofline.md.

Timing discipline (cost two sessions to learn — see docs/perf_roofline.md
§Methodology):  on this container's remote-execution TPU backend,
``block_until_ready`` is NOT a completion barrier — it can return in
~0.2 ms for a dispatch whose device work takes 0.3 s.  The only trustworthy
completion signal is fetching result BYTES to the host (``np.asarray``).
A fetch carries a fixed ~0.15-0.2 s tunnel overhead, so every measurement
here (a) repeats its workload INSIDE one jit via ``fori_loop``/``scan``
until device time is O(100 ms)+, (b) times dispatch→bytes-on-host at two
different repeat counts, and (c) reports the two-point SLOPE, which
cancels the fixed fetch/dispatch overhead.  End-to-end numbers
(bench.py) cross-check against full-frame wall clock at ≥ 1 s aggregates.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _true_time(run, x, r):
    """Seconds from dispatch to result bytes on host (forces completion)."""
    import numpy as np
    t0 = time.perf_counter()
    np.asarray(run(x, r)).ravel()[:1]
    return time.perf_counter() - t0


def _slope(run, x, r1, r2, reps=3):
    """Marginal seconds per unit-R via two-point fit; min over reps to
    reject scheduler noise."""
    _true_time(run, x, r1)                       # warm both programs
    _true_time(run, x, r2)
    d1 = min(_true_time(run, x, r1) for _ in range(reps))
    d2 = min(_true_time(run, x, r2) for _ in range(reps))
    return (d2 - d1) / (r2 - r1), d1, d2


def measure_vpu_peak():
    """Dependent mul-mul-add chain, K unrolled × R fori reps per element:
    attainable f32 VPU op rate."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, ROWS, LANES, GRID = 256, 512, 128, 16

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, R):
        def kernel(x_ref, o_ref):
            def body(_, x):
                c = jnp.float32(1e-9)
                for _i in range(K):
                    x = x + x * x * c
                return x
            o_ref[...] = jax.lax.fori_loop(0, R, body, x_ref[...])
        return pl.pallas_call(
            kernel, grid=(GRID,),
            in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES),
                                           jnp.float32))(x)

    x = jnp.full((GRID * ROWS, LANES), 0.5, jnp.float32)
    per_r, d1, d2 = _slope(run, x, 2048, 4096)
    ops_per_r = GRID * ROWS * LANES * K * 3
    return ops_per_r / per_r, {"d_r2048_s": round(d1, 3),
                               "d_r4096_s": round(d2, 3)}


def measure_hbm_bw():
    """R dependent full-array passes over 512 MB inside one dispatch:
    read+write streaming bandwidth."""
    import functools

    import jax
    import jax.numpy as jnp

    x = jnp.ones((128 * 1024 * 1024,), jnp.float32)     # 512 MB

    @functools.partial(jax.jit, static_argnums=1)
    def passes(x, R):
        # reduce to a scalar: np.asarray in _true_time fetches the WHOLE
        # result through the ~25 MB/s host tunnel — returning the 512 MB
        # array made the measurement a tunnel benchmark (cost one absurd
        # "8.8 GB/s HBM" reading to learn)
        return jnp.sum(jax.lax.scan(lambda c, _: (c * 1.0000001, 0.0), x,
                                    None, length=R)[0])

    per_r, d1, d2 = _slope(passes, x, 8, 24)
    return 2 * x.size * 4 / per_r, {"d_r8_s": round(d1, 3),
                                    "d_r24_s": round(d2, 3)}


def measure_hbm_bw_pallas():
    """True DMA streaming bandwidth: a grid-stepped Pallas copy (each grid
    step DMAs an (8·k, 128·m) block HBM→VMEM→HBM), R dependent copies
    chained in a scan.  Distinguishes real HBM bandwidth from whatever the
    XLA elementwise loop of :func:`measure_hbm_bw` is actually doing."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS, LANES, GRID = 512, 1024, 64          # 512·1024·4 B = 2 MB/block
    x = jnp.ones((GRID * ROWS, LANES), jnp.float32)   # 128 MB

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0      # +1 keeps scan iterations dependent

    copy = pl.pallas_call(
        kernel, grid=(GRID,),
        in_specs=[pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES), jnp.float32))

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, R):
        # scalar-reduced for the same tunnel-fetch reason as measure_hbm_bw
        return jnp.sum(jax.lax.scan(lambda c, _: (copy(c), 0.0), x, None,
                                    length=R)[0])

    per_r, d1, d2 = _slope(run, x, 16, 48)
    return 2 * x.size * 4 / per_r, {"d_r16_s": round(d1, 3),
                                    "d_r48_s": round(d2, 3)}


def measure_mxu_peak():
    """R chained 2048² bf16 matmuls: attainable MXU rate (the bound for
    the tableops one-hot-matmul backward)."""
    import functools

    import jax
    import jax.numpy as jnp

    N = 2048
    x = jnp.ones((N, N), jnp.bfloat16)
    w = jnp.eye(N, dtype=jnp.bfloat16) * 1.0000001

    @functools.partial(jax.jit, static_argnums=1)
    def run(x, R):
        return jnp.sum(jax.lax.scan(lambda c, _: (jnp.dot(c, w), 0.0), x,
                                    None, length=R)[0].astype(jnp.float32))

    per_r, d1, d2 = _slope(run, x, 64, 192)
    return 2 * N ** 3 / per_r, {"d_r64_s": round(d1, 3),
                                "d_r192_s": round(d2, 3)}


def measure_hit_kernel():
    """The production Pallas hit kernel, R dependent invocations chained
    through a negligible origin perturbation inside one dispatch."""
    import functools

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

    @functools.partial(jax.jit, static_argnums=1)
    def step(o, R):
        def body(o, _):
            h = scene.hit_fn(scene.params, o, d)
            return o + 1e-12 * h["t"][:, None], 0.0
        return jax.lax.scan(body, o, None, length=R)[0]

    per_r, d1, d2 = _slope(step, o, 64, 192)

    # analytic vector-op count per ray (see docs/perf_roofline.md)
    n_nodes = 14
    per_ray = (25 * L + 2 * L * (6 * L + 2 * n_nodes + 10) + 15 * L)
    return {"B": B, "L": L, "seconds_per_call": per_r,
            "rays_per_s": B / per_r,
            "analytic_ops_per_ray": per_ray,
            "ops_per_s": B * per_ray / per_r,
            "bytes_per_ray": 48,
            "bytes_per_s": B * 48 / per_r,
            "d_r64_s": round(d1, 3), "d_r192_s": round(d2, 3)}


def measure_trace_forward(compact):
    """Full forward trace; single dispatch is ≥ 25 ms so a dependent
    host-level chain times truthfully (cross-checked against bench.py
    full-frame wall clock)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
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

    x = step(o)
    np.asarray(x).ravel()[:1]
    iters = 40
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    np.asarray(x).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    B = o.shape[0]
    return {"B": B, "depth": depth, "compact": compact, "seconds": dt,
            "segments_per_s": B * (depth + 1) / dt}


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    vpu, vdbg = measure_vpu_peak()
    print(json.dumps({"vpu_f32_tops_per_s": round(vpu / 1e12, 3), **vdbg}),
          flush=True)
    bw, bdbg = measure_hbm_bw()
    print(json.dumps({"hbm_gb_per_s_xla_loop": round(bw / 1e9, 1), **bdbg}),
          flush=True)
    bwp, pdbg = measure_hbm_bw_pallas()
    print(json.dumps({"hbm_gb_per_s_pallas_dma": round(bwp / 1e9, 1),
                      **pdbg}), flush=True)
    mxu, mdbg = measure_mxu_peak()
    print(json.dumps({"mxu_bf16_tflops_per_s": round(mxu / 1e12, 1),
                      **mdbg}), flush=True)
    hk = measure_hit_kernel()
    hk["vpu_utilization"] = round(hk["ops_per_s"] / vpu, 3)
    hk["hbm_utilization"] = round(hk["bytes_per_s"] / max(bw, bwp), 4)
    print(json.dumps(hk), flush=True)
    for compact in (False, True):
        tf = measure_trace_forward(compact)
        tf["hit_kernel_fraction_at_full_width"] = round(
            hk["seconds_per_call"] * (tf["depth"] + 1) / tf["seconds"], 3)
        print(json.dumps(tf), flush=True)


if __name__ == "__main__":
    main()
