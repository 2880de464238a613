"""Union-sweep first-hit stage breakdown at large L.

Times cumulative stage prefixes of the sorted-interval sweep
(ptx.geom.fasthit._compile_union_sweep) — intervals → +sort →
+prefix/selection → full hit (replay + payload) — as dependent-dispatch
chains (timing rules: tools/roofline.py; block_until_ready is not a
barrier on this backend, only fetched bytes are).  Decides whether the
next large-scene lever is the sort (Pallas/fixpoint) or the payload.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(step, x0, iters=20):
    import numpy as np
    fetch = lambda x: np.asarray(x[:1])
    x = step(x0)
    fetch(x)
    for _ in range(3):
        x = step(x)
    fetch(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    fetch(x)
    return (time.perf_counter() - t0) / iters


def main(n_spheres=249, B=65536):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ptx.core.constants import EPS, MAX_VALUE
    from ptx.geom.fasthit import (_PAD_T, _leaf_intervals_grouped,
                                  collect_leaves, compile_fast_hit)
    from ptx.integrate.trace import compile_scene
    from ptx.scenes.builders import stress_spheres

    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    scene = compile_scene(stress_spheres(n_spheres))
    leaves = collect_leaves(scene.plan)
    L = len(leaves)
    params = scene.params
    NEG = np.float32(-3e20)

    g = np.random.default_rng(0)
    o0 = jnp.asarray(g.uniform(-1, 1, (B, 3)).astype(np.float32))
    d = jnp.asarray(np.stack([g.uniform(-1.5, 1.5, B),
                              g.uniform(-0.8, 0.5, B),
                              np.full(B, -1.0)], -1).astype(np.float32))

    def intervals(o):
        fl = lambda a: a.reshape(-1)
        return _leaf_intervals_grouped(
            leaves, params, fl(o[:, 0]), fl(o[:, 1]), fl(o[:, 2]),
            fl(d[:, 0]), fl(d[:, 1]), fl(d[:, 2]))

    def with_sort(o):
        t0, t1 = intervals(o)
        valid = (t0 < t1) & (t1 >= EPS)
        s = jnp.where(valid, t0, _PAD_T)
        e = jnp.where(valid, t1, NEG)
        return jax.lax.sort((s, e), dimension=0, num_keys=1,
                            is_stable=True)

    def with_selection(o):
        s_s, e_s = with_sort(o)
        inc_e = jax.lax.associative_scan(jnp.maximum, e_s, axis=0)
        P_e = jnp.concatenate([jnp.full((1, B), NEG), inc_e[:-1]], axis=0)
        is_break = (s_s < 2e20) & (s_s > P_e)
        te = jnp.min(jnp.where(is_break & (s_s >= EPS), s_s, _PAD_T),
                     axis=0)
        tx = jnp.min(jnp.where(is_break & (P_e >= EPS), P_e, _PAD_T),
                     axis=0)
        tx = jnp.minimum(
            tx, jnp.where(inc_e[-1] >= EPS, inc_e[-1], _PAD_T))
        return jnp.minimum(te, tx)

    def with_fixpoint(o):
        # mirrors the production fixpoint selection (fasthit sweep_mode
        # "fixpoint"): uncovered rays take min start, covered rays take
        # the chain-exit fixed point
        t0, t1 = intervals(o)
        valid = (t0 < t1) & (t1 >= EPS)
        s = jnp.where(valid, t0, _PAD_T)
        e = jnp.where(valid, t1, NEG)
        has_below = jnp.any(s < EPS, axis=0)
        t_entry = jnp.min(s, axis=0)
        E0 = jnp.max(jnp.where(s < EPS, e, NEG), axis=0)

        def body(c):
            E, _ = c
            En = jnp.maximum(E, jnp.max(
                jnp.where(s <= E[None, :], e, NEG), axis=0))
            return En, jnp.all(En == E)

        E, _ = jax.lax.while_loop(lambda c: ~c[1], body,
                                  (E0, jnp.array(False)))
        return jnp.where(has_below, E, t_entry)

    hit_fn = scene.hit_fn

    def full(o):
        return hit_fn(params, o, d)["t"]

    stages = {
        "intervals": lambda o: o + 1e-12 * jnp.clip(
            intervals(o)[0][0], -1, 1)[:, None],
        "+sort": lambda o: o + 1e-12 * jnp.clip(
            with_sort(o)[0][0], -1, 1)[:, None],
        "+selection": lambda o: o + 1e-12 * jnp.clip(
            with_selection(o), -1, 1)[:, None],
        "+fixpoint": lambda o: o + 1e-12 * jnp.clip(
            with_fixpoint(o), -1, 1)[:, None],
        "full_hit": lambda o: o + 1e-12 * jnp.clip(full(o), -1, 1)[:, None],
    }
    out = {"L": L, "B": B}
    for name, fn in stages.items():
        step = jax.jit(fn)
        dt = timed(step, o0)
        out[name + "_ms"] = round(dt * 1e3, 3)
        out[name + "_mrps"] = round(B / dt / 1e6, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 249
    main(n)
