"""Headline benchmark: rays/sec/chip, forward + backward, on the flagship
CSG scene at 512×512 / 64 spp (BASELINE.json metric).

A "ray" is one path segment evaluated against the full scene (primary hit
or bounce): rays = H · W · spp · (depth + 1).  The wavefront evaluates
every segment slot regardless of liveness — that uniformity is the design —
so the count is exact, not an estimate.

``vs_baseline``: the reference publishes no numbers (README is 2 lines) and
its binary cannot run here (gitignored HDR asset, SDL dependency).  The
stand-in baseline is the scalar NumPy oracle (tests/oracle.py — a faithful
re-derivation of the reference recursion) timed on this host and multiplied
by 100 as a generous proxy for an optimized multithreaded C++ CPU renderer
(≈25× scalar-Python→C++ × ≈4 effective cores).  vs_baseline =
tpu_rays_per_sec / (oracle_rays_per_sec · 100).
"""

import json
import sys
import time

import numpy as np


def bench_tpu(width=512, height=512, spp=64, depth=16, spp_chunk=4,
              warmup=1, iters=3):
    import jax
    import jax.numpy as jnp
    from ptx.core import rng as prng
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.integrate.trace import compile_scene, trace_rays
    from ptx.scenes.builders import make_world

    scene = compile_scene(make_world())
    cam = Camera.reference_demo(width, height)
    key = jax.random.PRNGKey(0)

    rows = height // 4            # 4 row-bands × spp_chunk samples per dispatch

    def chunk_loss(params, key, y0):
        ys = y0 + jnp.arange(rows)
        o, d = sample_rays(cam, key, ys, jnp.arange(width), spp_chunk)
        radiance = trace_rays(scene, params, o, d, key, depth)
        return jnp.mean(radiance)

    grad_fn = jax.jit(jax.value_and_grad(chunk_loss))

    # warmup / compile
    for _ in range(warmup):
        loss, grads = grad_fn(scene.params, key, jnp.int32(0))
        jax.block_until_ready(grads)

    n_chunks_per_frame = (height // rows) * (spp // spp_chunk)
    chunks_timed = min(n_chunks_per_frame, 8 * iters)
    t0 = time.perf_counter()
    for i in range(chunks_timed):
        k = prng.fold(key, i)
        y0 = jnp.int32((i % (height // rows)) * rows)
        loss, grads = grad_fn(scene.params, k, y0)
    jax.block_until_ready(grads)
    dt = time.perf_counter() - t0

    rays_per_chunk = rows * width * spp_chunk * (depth + 1)
    rays_per_sec = rays_per_chunk * chunks_timed / dt
    return rays_per_sec, float(loss)


def bench_oracle(depth=16, budget_rays=600):
    """Scalar oracle throughput on the same scene geometry (ray segments/s)."""
    sys.path.insert(0, "tests")
    import oracle as orc

    diffuse = orc.OMaterial(reflect=0.8, scatter=1.0)
    glass = orc.OMaterial(reflect=0.7, scatter=0.0, transmit=0.9, ior=1.3,
                          transmit_reflect=1.0)
    sky = orc.OMaterial(reflect=0.0, scatter=0.0, emissive=(0.5, 0.6, 0.8))
    world = orc.OUnion(
        orc.OSphere((1, 0, -4), 0.2, diffuse),
        orc.OIntersection(
            orc.OSphere((1, 0, -4), 1.0, glass),
            orc.OUnion(orc.OPlane((-1, 0, -0.7), 3.8, glass),
                       orc.OSphere((1, 0, -4), 0.2, sky))),
        orc.OSphere((-1, 0, -4), 0.2, diffuse),
        *[orc.OPlane(n, 200.0, sky) for n in
          [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (1, 0, 0), (-1, 0, 0)]],
    )
    rng = np.random.default_rng(0)
    segments = 0
    t0 = time.perf_counter()
    i = 0
    while segments < budget_rays:
        d = np.array([((i * 37) % 100 - 50) / 120.0,
                      ((i * 53) % 100 - 50) / 120.0, -1.0])
        orc.trace_ray(world, np.zeros(3), d, depth, rng, scatter_cap=4)
        segments += depth + 1     # same segment accounting as the TPU path
        i += 1
    dt = time.perf_counter() - t0
    return segments / dt


def main():
    rays_per_sec, loss = bench_tpu()
    oracle_rps = bench_oracle()
    baseline_proxy = oracle_rps * 100.0
    result = {
        "metric": "rays_per_sec_per_chip_fwd_bwd_512x512_64spp_depth16",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / baseline_proxy, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
