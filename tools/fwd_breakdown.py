"""Forward-trace cost breakdown with reliable (≥10 ms/dispatch) timing.

Times the full uncompacted forward at B=131k/depth 16 against ablated
variants to locate where non-kernel time goes: scatter-RNG draws
(SCATTER_TRIES), material evaluation, everything-but-hit.  Feeds
docs/perf_roofline.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(step, x0, iters=20):
    import jax
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def run(label, tries=None, const_material=False, hit_only=False):
    import jax
    import jax.numpy as jnp
    from ptx.core import rng
    from ptx.integrate import trace as tr
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.scenes.builders import make_world

    old_tries = tr.SCATTER_TRIES
    if tries is not None:
        tr.SCATTER_TRIES = tries
    try:
        scene = tr.compile_scene(make_world())
        if const_material:
            real = scene.material_fn
            const = {}

            def const_mat(params, pos, mat_id):
                out = real(params, jax.lax.stop_gradient(pos) * 0.0, mat_id)
                return out
            scene.material_fn = const_mat
        cam = Camera.reference_demo(512, 512)
        key = jax.random.PRNGKey(0)
        o, d = sample_rays(cam, key, jnp.arange(256), jnp.arange(512), 1)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        depth = 16

        if hit_only:
            @jax.jit
            def step(o):
                def body(o, i):
                    h = scene.hit_fn(scene.params, o, d)
                    o = o + 1e-12 * h["t"][:, None]
                    return o, 0.0
                return jax.lax.scan(body, o, jnp.arange(depth + 1))[0]
        else:
            @jax.jit
            def step(o):
                r = tr.trace_rays(scene, scene.params, o, d, key, depth,
                                  compact=False)
                return o + 1e-12 * r.sum(-1, keepdims=True)

        dt = timed(step, o)
        B = o.shape[0]
        return {"variant": label, "ms": round(dt * 1e3, 2),
                "segments_mrps": round(B * (depth + 1) / dt / 1e6, 2)}
    finally:
        tr.SCATTER_TRIES = old_tries


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for cfg in [
        ("full_exact_sampler", dict()),
        ("const_material", dict(const_material=True)),
        ("hit_plus_loop_only", dict(hit_only=True)),
    ]:
        label, kw = cfg
        try:
            print(json.dumps(run(label, **kw)), flush=True)
        except Exception as e:
            print(json.dumps({"variant": label, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
