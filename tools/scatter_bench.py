"""Large-image scatter-add variants, measured the roofline way.

The 3k-sky profile (tools/profile_step.py grad 6 sky1536x3072) shows ONE
op dominating: scatter-add of ~183k cotangent rows into the flattened
(4.7M, 4) image = 8.07 ms, 44 ns/row — 10× the ~4 ns/row the radiance
scatters achieve into small operands.  This harness times the candidate
replacements as dependent chains with a bytes-fetch barrier (never trust
block_until_ready here — docs/perf_roofline.md).

Run: python tools/scatter_bench.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W, C = 1536, 3072, 4
N = 182954


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ptx.utils.profiling import log

    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")

    key = jax.random.PRNGKey(0)
    yi = jax.random.randint(jax.random.fold_in(key, 0), (N,), 0, H)
    xi = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, W)
    ct = jax.random.uniform(jax.random.fold_in(key, 2), (N, C))
    lin = yi * W + xi
    lin_sorted = jnp.sort(lin)

    def timed(name, fn, *args, iters=None):
        """Dependent chain: each iteration's scalar digest feeds the next
        call's first row, forcing sequential execution; ends with a fetch."""
        f = jax.jit(fn)
        out = f(jnp.float32(0.0), *args)
        float(out)  # compile + settle
        # pilot
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(4):
            acc = f(acc, *args)
        float(acc)
        pilot = (time.perf_counter() - t0) / 4
        n = max(8, int(1.0 / max(pilot, 1e-5))) if iters is None else iters
        acc = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            acc = f(acc, *args)
        assert np.isfinite(float(acc))
        dt = (time.perf_counter() - t0) / n
        log(name, ms=round(dt * 1e3, 3), ns_per_row=round(dt / N * 1e9, 1),
            iters=n)
        return dt

    def v0_2d(acc, yi, xi, ct):
        d = jnp.zeros((H, W, C), jnp.float32).at[yi, xi].add(ct + acc * 1e-20)
        return jnp.sum(d[0, 0]) + acc

    def v1_flat(acc, lin, ct):
        d = jnp.zeros((H * W, C), jnp.float32).at[lin].add(ct + acc * 1e-20)
        return jnp.sum(d[0]) + acc

    def v2_rgb(acc, lin, ct):
        d = jnp.zeros((H * W, 3), jnp.float32).at[lin].add(ct[:, :3] + acc * 1e-20)
        return jnp.sum(d[0]) + acc

    def v3_sorted(acc, lin_s, ct):
        d = jnp.zeros((H * W, C), jnp.float32).at[lin_s].add(
            ct + acc * 1e-20, indices_are_sorted=True)
        return jnp.sum(d[0]) + acc

    def v4_sort_then_scatter(acc, lin, ct):
        order = jnp.argsort(lin)
        d = jnp.zeros((H * W, C), jnp.float32).at[lin[order]].add(
            ct[order] + acc * 1e-20, indices_are_sorted=True)
        return jnp.sum(d[0]) + acc

    def v5_segment(acc, lin, ct):
        d = jax.ops.segment_sum(ct + acc * 1e-20, lin, num_segments=H * W)
        return jnp.sum(d[0]) + acc

    def v6_smaller_n(acc, lin, ct):
        d = jnp.zeros((H * W, C), jnp.float32).at[lin[:131072]].add(
            ct[:131072] + acc * 1e-20)
        return jnp.sum(d[0]) + acc

    def v7_small_img(acc, yi, xi, ct):
        # same N into a 64×128 image — the per-row cost floor
        d = jnp.zeros((64, 128, C), jnp.float32).at[yi % 64, xi % 128].add(
            ct + acc * 1e-20)
        return jnp.sum(d[0, 0]) + acc

    timed("v0_2d_HWC", v0_2d, yi, xi, ct)
    timed("v1_flat", v1_flat, lin, ct)
    timed("v2_rgb_only", v2_rgb, lin, ct)
    timed("v3_presorted_flag", v3_sorted, lin_sorted, ct)
    timed("v4_sort_then_scatter", v4_sort_then_scatter, lin, ct)
    timed("v5_segment_sum", v5_segment, lin, ct)
    timed("v6_131k_rows", v6_smaller_n, lin, ct)
    timed("v7_small_image_same_N", v7_small_img, yi, xi, ct)


if __name__ == "__main__":
    main()
