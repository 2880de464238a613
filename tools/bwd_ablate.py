"""Backward-cost ablation: which part of the manual-VJP replay dominates?

NOTE (round 2): scenes with the fused backward kernel
(scene.bounce_bwd_fn, ptx.ops.bounce_kernel) BYPASS _bounce_replay in
the manual VJP, so the replay-patching modes below only ablate the
fallback XLA path — run with PTX_FUSED=0 for meaningful numbers, or use
the eval_emissive stop-grad probes (see git history /tmp scripts) for
the fused path.

Times fwd+bwd at the bench shape with parts of the replay's gradient paths
severed (stop_gradient), isolating: geometry recompute (hit replay),
material/texture eval, and the throughput chain.  Informs the roofline
note (docs/perf_roofline.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = ["full", "no_params", "no_hit_replay", "no_material", "fwd_only"]


def run(mode, spp_chunk=1, rows=256, width=512, depth=16):
    import jax
    import jax.numpy as jnp
    from ptx.core import rng as prng
    from ptx.integrate import trace as tr
    from ptx.integrate.camera import sample_rays

    scene, cam = run.scene, run.cam

    # ablate by patching the replay's inputs
    orig_replay = tr._bounce_replay

    def patched_replay(scene_, params, o, d, thr, stg, alive, dec):
        sg = jax.lax.stop_gradient
        if mode == "no_params":
            params = sg(params)
        if mode == "no_hit_replay":
            t, normal = scene_.hit_replay_fn(params, o, d, dec["evt"],
                                             dec["entering"], dec["hit"])
            t, normal = sg(t), sg(normal)
            # inline rest of replay with frozen t/normal
            return _rest(scene_, params, o, d, thr, stg, alive, dec,
                         t, normal)
        if mode == "no_material":
            return _rest_nomat(scene_, params, o, d, thr, stg, alive, dec)
        return orig_replay(scene_, params, o, d, thr, stg, alive, dec)

    def _rest(scene_, params, o, d, thr, stg, alive, dec, t, normal):
        import types
        # call orig with hit_replay_fn stubbed to return frozen values
        stub = types.SimpleNamespace(**{**scene_.__dict__})
        stub.hit_replay_fn = lambda *a: (t, normal)
        stub.material_fn = scene_.material_fn
        return orig_replay(stub, params, o, d, thr, stg, alive, dec)

    def _rest_nomat(scene_, params, o, d, thr, stg, alive, dec):
        import types
        sg = jax.lax.stop_gradient
        real_mat = scene_.material_fn
        stub = types.SimpleNamespace(**{**scene_.__dict__})
        stub.material_fn = lambda p, pos, mid: jax.tree.map(
            sg, real_mat(p, sg(pos), mid))
        return orig_replay(stub, params, o, d, thr, stg, alive, dec)

    tr._bounce_replay = patched_replay
    try:
        def chunk_loss(params, key, i):
            key = prng.fold(key, i)
            ys = jnp.arange(rows)
            o, dd = sample_rays(cam, key, ys, jnp.arange(width), spp_chunk)
            r = tr.trace_rays(scene, params, o, dd, key, depth,
                              manual_vjp=True)
            return jnp.mean(r)

        key = jax.random.PRNGKey(0)
        if mode == "fwd_only":
            fn = jax.jit(chunk_loss)
        else:
            fn = jax.jit(jax.grad(chunk_loss))
        out = fn(scene.params, key, jnp.int32(0))
        jax.block_until_ready(out)
        n = 12
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(scene.params, key, jnp.int32(i))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rays = rows * width * spp_chunk * (depth + 1) * n
        return {"mode": mode, "mrps": round(rays / dt / 1e6, 2),
                "ms_per_chunk": round(dt / n * 1e3, 1)}
    finally:
        tr._bounce_replay = orig_replay


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ptx.integrate.camera import Camera
    from ptx.integrate.trace import compile_scene
    from ptx.scenes.builders import make_world
    run.scene = compile_scene(make_world())
    run.cam = Camera.reference_demo(512, 512)
    for mode in MODES:
        # new scene cache per mode: the cached _manual_bounce closes over
        # the patched replay at trace time
        run.scene._manual_bounce = None
        try:
            print(json.dumps(run(mode)), flush=True)
        except Exception as e:
            print(json.dumps({"mode": mode, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
