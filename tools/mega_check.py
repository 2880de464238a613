"""On-chip megasweep gate + A/B: agreement vs the jnp fixpoint sweep and
leaf-scaling throughput for sweep modes (VERDICT r3 #1).

Usage: python tools/mega_check.py [--sizes 57,121,249] [--depth 4]
Prints one JSON line per (L, mode) plus an agreement line per L.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def agreement(n):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ptx.geom.fasthit import collect_leaves, compile_fast_hit
    from ptx.integrate.trace import compile_scene
    from ptx.scenes.builders import stress_spheres

    scene = compile_scene(stress_spheres(n))
    L = len(collect_leaves(scene.plan))
    fix = compile_fast_hit(scene.plan, sweep=True, sweep_mode="fixpoint")
    mega = compile_fast_hit(scene.plan, sweep=True, sweep_mode="mega",
                            params_ref=scene.params)
    rng = np.random.default_rng(0)
    B = 65536
    o = rng.uniform(-8, 8, (B, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(-1.2, 4, B)
    d = rng.normal(size=(B, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.asarray(o); d = jnp.asarray(d)
    ha = jax.jit(lambda p: fix(p, o, d))(scene.params)
    hb = jax.jit(lambda p: mega(p, o, d))(scene.params)
    out = {"event": "mega_agreement", "L": L, "B": B}
    worst = 0
    for k in ("hit", "entering", "_evt", "mat_id"):
        nmm = int((np.asarray(ha[k]) != np.asarray(hb[k])).sum())
        out[k + "_mismatch"] = nmm
        worst = max(worst, nmm)
    out["t_maxdiff"] = float(np.abs(np.asarray(ha["t"]) -
                                    np.asarray(hb["t"])).max())
    # Diagnosed flip class (round 4): f64 recompute shows every mismatch
    # lane sits at a measure-zero boundary — a grazing tangency whose
    # disc is inside f32 rounding noise of the EPS cut, or a sky-box
    # corner where two planes' entries are rounding-close.  Mosaic fma
    # contraction vs XLA fusion rounds those differently; each path is
    # self-consistent.  Gate: flip FRACTION, same policy as the
    # tpu_golden divergent-lane gates.
    out["flip_frac"] = round(worst / B, 6)
    print(json.dumps(out), flush=True)
    return worst / B


def throughput(n, mode, depth):
    os.environ["PTX_SWEEP_MODE"] = mode
    # compile paths key on env at compile time; fresh modules not needed —
    # compile_fast_hit reads env per call
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ptx.geom.fasthit import collect_leaves
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.integrate.trace import compile_scene, trace_rays
    from ptx.scenes.builders import stress_spheres

    t0 = time.perf_counter()
    scene = compile_scene(stress_spheres(n))
    L = len(collect_leaves(scene.plan))
    cam = Camera.reference_demo(512, 512)
    key = jax.random.PRNGKey(0)
    o, d = sample_rays(cam, key, jnp.arange(128), jnp.arange(512), 1)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    @jax.jit
    def step(o):
        r = trace_rays(scene, scene.params, o, d, key, depth)
        return o + 1e-12 * r.sum(-1, keepdims=True)

    fetch = lambda a: np.asarray(a[:1, :1])
    x = step(o)
    fetch(x)
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        x = step(x)
    fetch(x)
    iters = 20
    t1 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    fetch(x)
    dt = (time.perf_counter() - t1) / iters
    B = o.shape[0]

    def loss(p, o):
        r = trace_rays(scene, p, o, d, key, depth)
        return jnp.mean(r)

    @jax.jit
    def gstep(o, acc):
        v, g = jax.value_and_grad(loss)(scene.params, o)
        return o + 1e-12 * v, acc + v

    acc = jnp.float32(0.0)
    x, acc = gstep(o, acc)
    float(acc)
    for _ in range(3):
        x, acc = gstep(x, acc)
    float(acc)
    giters = 12
    t2 = time.perf_counter()
    for _ in range(giters):
        x, acc = gstep(x, acc)
    assert np.isfinite(float(acc))
    dt_g = (time.perf_counter() - t2) / giters
    print(json.dumps({"event": "mega_throughput", "L": L, "mode": mode,
                      "compile_s": round(compile_s, 1),
                      "fwd_mrps": round(B * (depth + 1) / dt / 1e6, 2),
                      "fwd_bwd_mrps": round(B * (depth + 1) / dt_g / 1e6,
                                            2)}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="57,121,249")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--modes", default="fixpoint,mega")
    ap.add_argument("--no-agree", action="store_true")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sizes = [int(s) for s in args.sizes.split(",")]
    worst_frac = 0.0
    for n in sizes:
        if not args.no_agree:
            worst_frac = max(worst_frac, agreement(n))
        for mode in args.modes.split(","):
            throughput(n, mode, args.depth)
    sys.exit(1 if worst_frac > 3e-3 else 0)


if __name__ == "__main__":
    main()
