"""Forward-trace cost breakdown with reliable (≥10 ms/dispatch) timing.

Times the full uncompacted forward at B=131k/depth 16 against ablated
variants to locate where non-kernel time goes: scatter-RNG draws
(SCATTER_TRIES), material evaluation, everything-but-hit.  Feeds
docs/perf_roofline.md.


NOTE (round 2): with the fused bounce kernel active the
const_material / tries / sampler patches only affect the
UNFUSED path — set PTX_FUSED=0 to ablate the XLA composition,
or read docs/perf_roofline.md for the fused-path breakdown.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(step, x0, iters=20):
    """Dependent-dispatch chain ending in a bytes fetch — on this remote
    backend block_until_ready is NOT a completion barrier (see
    tools/roofline.py module docstring); only fetched bytes are.  Fetch a
    device-sliced scalar, not the carry: np.asarray on the full (B, 3)
    carry pulls ~1.5 MB through the ~25 MB/s tunnel (~3 ms/iter of pure
    transfer contaminating every variant)."""
    import numpy as np
    fetch = lambda x: np.asarray(x[:1, :1])
    x = step(x0)
    fetch(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    fetch(x)
    return (time.perf_counter() - t0) / iters


def make_world_const_sky():
    """The demo world with the sky's dynamic texture chain (Multiply →
    Transformed → SphericalCoords → ImageTex gather) replaced by a
    constant emissive — isolates the per-bounce texture-eval cost.
    Geometry identical to builders.make_world (same leaf count)."""
    import math

    import numpy as np
    from ptx.core import linalg
    from ptx.geom.tape import Intersection, Plane, Sphere, Union
    from ptx.scenes.builders import make_lens, sky_planes, union_array
    from ptx.shade.materials import Material, transform_material

    mat_diffuse = Material(reflect=0.8, scatter=1.0)
    mat_emit_w = Material(reflect=0.0, scatter=0.0, emissive=2.0)
    mat_glass = Material(reflect=0.7, scatter=0.0, emissive=0.0,
                         transmit=0.9, ior=1.3, transmit_reflect=1.0)
    sky = Material(reflect=0.0, scatter=0.0, emissive=(0.5, 0.6, 0.8))
    shift = np.asarray(linalg.translate((-1.0, 0.0, 4.0)))
    return union_array([
        Sphere((1.0, 0.0, -4.0), 0.2, transform_material(shift, mat_diffuse)),
        Intersection(
            Sphere((1.0, 0.0, -4.0), 1.0, mat_glass),
            Union(
                Plane.from_point((-1.0, 0.0, -0.7), (1.0, 0.0, -4.0), mat_glass),
                Sphere((1.0, 0.0, -4.0), 0.2, transform_material(shift, mat_emit_w)),
            ),
        ),
        Sphere((-1.0, 0.0, -4.0), 0.2, mat_diffuse),
        *sky_planes(sky),
        make_lens((-2.5 / 4, 0.0, -2.5), (-1.0, 0.0, -4.0), 0.5, 1.0, mat_glass),
    ])


def run(label, tries=None, const_material=False, hit_only=False,
        const_sky=False, fixed_rng=False, mirror_only=False,
        no_transmit=False):
    import jax
    import jax.numpy as jnp
    from ptx.core import linalg, rng
    from ptx.integrate import trace as tr
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.scenes.builders import make_world

    old_tries = tr.SCATTER_TRIES
    if tries is not None:
        tr.SCATTER_TRIES = tries
    saved = {}

    def patch(mod, name, fn):
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, fn)

    if fixed_rng:
        # remove threefry hashing (fold + uniform) — control flow stays
        # lane-varying because the comparisons mix in per-lane geometry
        patch(rng, "fold", lambda k, *a: k)
        patch(jax.random, "uniform", lambda key, shape=(), **kw:
              jnp.full(shape, 0.4321, jnp.float32))
    if mirror_only:
        # pure specular reflection in place of the cap sampler
        def mirror(key, direction, normal, scatter_c, return_raw=False):
            out = linalg.reflect(direction, normal)
            ok = jnp.ones(out.shape[:-1], bool)
            if return_raw:
                return out, ok, jnp.zeros_like(out)
            return out, ok
        patch(tr, "sample_scatter_dir", mirror)
    if no_transmit:
        patch(linalg, "refract_strength",
              lambda d, eta, n: jnp.zeros(d.shape[:-1], d.dtype))
        patch(linalg, "refract", lambda d, eta, n: jnp.zeros_like(d))
    try:
        world = make_world_const_sky() if const_sky else make_world()
        scene = tr.compile_scene(world)
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
        for (mod, name), fn in saved.items():
            setattr(mod, name, fn)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ptx-jax-cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    for cfg in [
        ("full_exact_sampler", dict()),
        ("const_sky_no_gather", dict(const_sky=True)),
        ("const_material", dict(const_material=True)),
        ("fixed_rng_no_threefry", dict(fixed_rng=True)),
        ("mirror_no_sampler", dict(mirror_only=True)),
        ("no_transmit_branch", dict(no_transmit=True)),
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
