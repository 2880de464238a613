"""Profile the LARGE-SCENE (megasweep) fwd or fwd+bwd step and decode
the trace into a top-ops table (decoder shared with profile_step).

The honest wall numbers (tools/scale_bench.py, round 4) put the
large-scene backward at 1.8-2.9x forward — this attributes it.

Usage: python tools/mega_prof.py [fwd|grad] [iters] [units] [kind]
e.g. python tools/mega_prof.py grad 6 249 spheres
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_step import decode


def run(mode="grad", iters=6, units=249, kind="spheres",
        logdir="/tmp/ptx-prof-mega", depth=4):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.integrate.trace import compile_scene, trace_rays
    from ptx.scenes.builders import stress_gadgets, stress_spheres

    builder = stress_spheres if kind == "spheres" else stress_gadgets
    scene = compile_scene(builder(units))
    cam = Camera.reference_demo(512, 512)
    key = jax.random.PRNGKey(0)
    o, d = sample_rays(cam, key, jnp.arange(128), jnp.arange(512), 1)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    def loss(p, o):
        r = trace_rays(scene, p, o, d, key, depth)
        return jnp.mean(r)

    if mode == "grad":
        # grads are jit OUTPUTS -> materialized, VJP cannot be DCE'd
        fn = jax.jit(jax.value_and_grad(loss))
    else:
        fn = jax.jit(loss)
    out = fn(scene.params, o)
    jax.block_until_ready(out)

    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        out = fn(scene.params, o)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return logdir, iters


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "grad"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    units = int(sys.argv[3]) if len(sys.argv) > 3 else 249
    kind = sys.argv[4] if len(sys.argv) > 4 else "spheres"
    logdir, iters = run(mode, iters, units, kind)
    decode(logdir, iters)
