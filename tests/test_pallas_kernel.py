"""Pallas first-hit megakernel vs the jnp reference path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.integrate.trace import compile_scene
from ptx.ops.fasthit_kernel import build_hit_kernel
from ptx.scenes.builders import baseline_config2, make_world


@pytest.mark.parametrize("scene_fn", [baseline_config2, make_world])
def test_kernel_matches_jnp_path(scene_fn):
    scene = compile_scene(scene_fn(), pallas=False)
    pk = build_hit_kernel(scene.plan)
    g = np.random.default_rng(0)
    n = 260                      # non-multiple of the tile: exercises padding
    o = jnp.asarray(g.uniform(-1, 1, (n, 3)).astype(np.float32))
    d = jnp.asarray(g.normal(size=(n, 3)).astype(np.float32))
    a = {k: np.asarray(v) for k, v in pk(scene.params, o, d).items()}
    b = {k: np.asarray(v) for k, v in
         jax.jit(scene.hit_fn)(scene.params, o, d).items()}
    np.testing.assert_array_equal(a["hit"], b["hit"])
    m = a["hit"]
    np.testing.assert_allclose(a["t"][m], b["t"][m], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(a["mat_id"][m], b["mat_id"][m])
    np.testing.assert_array_equal(a["entering"][m], b["entering"][m])
    np.testing.assert_allclose(a["normal"][m], b["normal"][m], atol=1e-4)


def test_kernel_vjp_matches_jnp_grads():
    scene = compile_scene(baseline_config2(), pallas=False)
    pk = build_hit_kernel(scene.plan)
    g = np.random.default_rng(1)
    n = 128
    o = jnp.zeros((n, 3))
    d = jnp.asarray(np.stack([g.uniform(-0.6, 0.6, n),
                              g.uniform(-0.6, 0.6, n),
                              -np.ones(n)], -1).astype(np.float32))

    def loss_pk(p):
        h = pk(p, o, d)
        return (jnp.sum(jnp.where(h["hit"], h["t"], 0.0))
                + jnp.sum(jnp.where(h["hit"][..., None], h["normal"],
                                    0.0) ** 2))

    def loss_jnp(p):
        h = scene.hit_fn(p, o, d)
        return (jnp.sum(jnp.where(h["hit"], h["t"], 0.0))
                + jnp.sum(jnp.where(h["hit"][..., None], h["normal"],
                                    0.0) ** 2))

    ga = jax.jit(jax.grad(loss_pk))(scene.params)
    gb = jax.jit(jax.grad(loss_jnp))(scene.params)
    for k in ("sphere_center", "sphere_radius", "plane_normal", "plane_d",
              "xform"):
        a, b = np.asarray(ga[k]), np.asarray(gb[k])
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=1e-4 * scale, err_msg=k)
