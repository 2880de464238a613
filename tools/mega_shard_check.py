"""Megasweep-under-shard_map hardware gate (VERDICT r4 #2b).

The large-scene production path (megasweep kernel + fused mega bounce +
row-fed replay backward) had zero sharding coverage: the CPU mesh tests
run the jnp fixpoint twin because Mosaic cannot lower there.  This tool
runs on the REAL chip: a mega-eligible composed scene (stress spheres
under the equirect image sky) renders and trains through
``render_sharded`` / ``make_train_step`` on a 1-device mesh, and the
results must digest-match the unsharded render / unsharded grads — this
catches block-shape or axis-index assumptions inside ``pallas_call``
under ``shard_map`` (the reference analogue: the farm renders the full
world per block, /root/reference/src/test.cpp:678,708).

Run: python tools/mega_shard_check.py       (exit 1 on any failure)
"""

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
    assert jax.default_backend() == "tpu", "mega_shard_check needs the chip"

    from ptx.core import rng
    from ptx.integrate.camera import Camera, sample_rays
    from ptx.integrate.trace import compile_scene, trace_rays
    from ptx.parallel import mesh as pmesh
    from ptx.parallel.render import make_train_step, render_sharded
    from ptx.scenes.builders import procedural_sky_image, stress_spheres

    img = procedural_sky_image(192, 384)
    scene = compile_scene(stress_spheres(57, sky_image=img))
    assert scene.bounce_fn is not None, "mega bounce must be active"
    from ptx.geom.fasthit import collect_leaves
    from ptx.ops.megasweep import mega_eligible
    assert mega_eligible(scene.plan, collect_leaves(scene.plan))

    mesh = pmesh.make_mesh(jax.devices()[:1], tiles=1, samples=1)
    cam = Camera(64, 64)
    key = jax.random.PRNGKey(3)
    depth, spp = 8, 4

    # --- render: sharded (1-device mesh) vs unsharded ------------------
    img_s = np.asarray(render_sharded(scene, cam, mesh, key, spp=spp,
                                      depth=depth))

    def unsharded(params):
        # replicate _local_render's RNG fold at tile=0, sample=0
        k = rng.fold(key, 0, 0)
        o, d = sample_rays(cam, k, jnp.arange(cam.height),
                           jnp.arange(cam.width), spp)
        rad = trace_rays(scene, params, o, d, k, depth)
        return jnp.mean(rad, axis=0)

    img_u = np.asarray(jax.jit(unsharded)(scene.params))
    render_max_abs = float(np.abs(img_s - img_u).max())

    # --- train step: grads under shard_map vs plain jit ----------------
    target = jnp.zeros((cam.height, cam.width, 3), jnp.float32)
    step = make_train_step(scene, cam, mesh, spp=spp, depth=depth,
                           learning_rate=0.0, compact=True,
                           manual_vjp=True)
    _, loss_s = step(scene.params, target, jax.random.fold_in(key, 1))

    def u_loss(params):
        k = rng.fold(jax.random.fold_in(key, 1), 0, 0)
        o, d = sample_rays(cam, k, jnp.arange(cam.height),
                           jnp.arange(cam.width), spp)
        rad = trace_rays(scene, params, o, d, k, depth, compact=True,
                         manual_vjp=True)
        return jnp.mean((jnp.mean(rad, axis=0) - target) ** 2)

    loss_u, grads_u = jax.jit(jax.value_and_grad(u_loss))(scene.params)
    loss_rel = abs(float(loss_s) - float(loss_u)) / max(
        abs(float(loss_u)), 1e-9)

    # grads under shard_map (lr=0 step discards them, so recompute)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ptx.parallel.mesh import SAMPLE_AXIS, TILE_AXIS
    from ptx.parallel.render import _local_render

    def body(params, k):
        def local_loss(p):
            im = _local_render(scene, cam, depth, spp, p, k, 0,
                               cam.height, compact=True, manual_vjp=True)
            return jnp.mean((im - target) ** 2)
        g = jax.grad(local_loss)(params)
        return jax.lax.pmean(jax.lax.pmean(g, TILE_AXIS), SAMPLE_AXIS)

    grads_s = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P(), P()), out_specs=P(),
        check_vma=False))(scene.params, jax.random.fold_in(key, 1))

    worst = 0.0
    worst_key = None
    for (pu, vu), (ps, vs) in zip(
            jax.tree_util.tree_flatten_with_path(grads_u)[0],
            jax.tree_util.tree_flatten_with_path(grads_s)[0]):
        assert pu == ps
        vu, vs = np.asarray(vu), np.asarray(vs)
        if vu.size == 0:       # e.g. the empty xform table on this scene
            continue
        assert np.isfinite(vs).all(), f"non-finite sharded grad {pu}"
        denom = max(float(np.abs(vu).max()), 1e-9)
        rel = float(np.abs(vs - vu).max()) / denom
        if rel > worst:
            worst, worst_key = rel, str(pu)
    img_gsum = sum(float(jnp.abs(l).sum())
                   for l in jax.tree.leaves(grads_s["images"]))

    out = {"render_max_abs": render_max_abs, "loss_rel": loss_rel,
           "grad_worst_rel": worst, "grad_worst_key": worst_key,
           "sky_img_gsum": img_gsum}
    print(json.dumps(out))
    assert render_max_abs == 0.0, \
        f"sharded render != unsharded ({render_max_abs})"
    assert loss_rel < 1e-6, f"loss divergence {loss_rel}"
    assert worst < 1e-5, f"grad divergence {worst} at {worst_key}"
    assert img_gsum > 0.0, "sky image grad vanished under shard_map"


if __name__ == "__main__":
    main()
