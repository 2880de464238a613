"""Per-bounce cull hit-rate instrumentation (VERDICT r4 #4).

The megasweep's cluster culling is block-coherent: a (cluster, ray-block)
pair is skipped only when NO lane in the 512-wide block hits the
cluster's bound.  Primary blocks are camera-coherent; post-scatter
bounces are not — this tool measures how fast that coherence decays by
re-running the production fused-bounce trace bounce by bounce and
evaluating the kernel's own cull predicate (Morton clusters, runtime
bounds, any-lane-per-block test) on each bounce's wavefront.

Prints one JSON line per bounce: alive fraction, fraction of
(cluster, block) pairs active (= NOT culled), and the active fraction
restricted to blocks that contain at least one live lane.

Usage: python tools/cull_stats.py [--n 249] [--depth 16] [--compact]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ptx.integrate import trace as tr
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.ops import megasweep as ms
    from ptx.scenes.builders import stress_spheres

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=249)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--compact", action="store_true",
                    help="apply the production compaction schedule "
                         "between phases (reorders + shrinks lanes)")
    args = ap.parse_args()

    scene = tr.compile_scene(stress_spheres(args.n))
    cam = Camera.reference_demo(512, 512)
    key = jax.random.PRNGKey(0)
    # full-frame row subsample — see tools/scale_bench.py band comment
    o, d = sample_rays(cam, key, jnp.arange(128) * 4, jnp.arange(512), 1)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    B = o.shape[0]

    # the kernel's own cluster assignment: Morton order on compile-time
    # centers, runtime bounds from live params (megasweep builder logic)
    centers = np.asarray(scene.params["sphere_center"])
    radii = np.abs(np.asarray(scene.params["sphere_radius"]))
    order = np.argsort(ms._morton(centers), kind="stable")
    c_ord = jnp.asarray(centers[order])
    r_ord = jnp.asarray(radii[order])
    ns = len(order)
    mask = jnp.ones((ns,), bool)
    bc, br = ms._cluster_bounds(c_ord, r_ord, mask, ms.CLUSTER)

    @jax.jit
    def cull_fracs(o, d, alive):
        Bp = -(-o.shape[0] // ms._BW) * ms._BW
        pad = Bp - o.shape[0]
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3))])
            d = jnp.concatenate([d, jnp.zeros((pad, 3))])
            alive = jnp.concatenate([alive, jnp.zeros((pad,), bool)])
        nb = Bp // ms._BW
        a = jnp.sum(d * d, axis=1)
        oc = o[None] - bc[:, None, :]                    # (nC, Bp, 3)
        bq = jnp.sum(oc * d[None], axis=-1)
        cc = jnp.sum(oc * oc, axis=-1) - (br * br)[:, None]
        disc = bq * bq - a[None] * cc
        sa = jnp.where(a == 0.0, 1.0, a)[None]
        t1 = (-bq + jnp.sqrt(jnp.maximum(disc, 0.0))) / sa
        from ptx.core.constants import EPS
        act = (disc > 0.0) & (t1 >= float(EPS)) & (a[None] != 0.0)
        actb = jnp.any(act.reshape(-1, nb, ms._BW), axis=-1)  # (nC, nb)
        liveb = jnp.any(alive.reshape(nb, ms._BW), axis=-1)   # (nb,)
        return (jnp.mean(actb.astype(jnp.float32)),
                (jnp.sum(actb * liveb[None])
                 / jnp.maximum(jnp.sum(liveb) * actb.shape[0], 1)),
                jnp.mean(alive))

    # production compaction schedule (trace._COMPACT_SCHEDULE)
    caps = {s: B // dv for s, dv in tr._COMPACT_SCHEDULE} \
        if args.compact else {}

    carry = (o, d, jnp.ones((B, 3)), jnp.ones(B), jnp.ones(B, bool))
    orig = jnp.arange(B)
    from ptx.core import rng as prng
    for b in range(args.depth + 1):
        if b in caps:
            carry, orig = tr._compact_wavefront(
                carry, orig, caps[b], key=prng.fold(key, 900 + b))
        frac_all, frac_live, alive_frac = cull_fracs(
            carry[0], carry[1], carry[4])
        print(json.dumps({
            "bounce": b, "lanes": int(carry[0].shape[0]),
            "alive_frac": round(float(alive_frac), 4),
            "active_pair_frac": round(float(frac_all), 4),
            "active_pair_frac_live_blocks": round(float(frac_live), 4),
        }), flush=True)
        k = prng.fold(key, b)
        carry, _dec = tr._bounce_live(scene, scene.params, *carry, k,
                                      b < args.depth, use_fused=True)


if __name__ == "__main__":
    main()
