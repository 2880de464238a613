"""Inverse rendering demo: recover scene parameters from a target image.

The differentiable-rendering "training loop": render a ground-truth frame,
perturb material/geometry parameters, and descend the pixel MSE back to
the truth — gradients flow through the full wavefront integrator
(hit distances, normals, Fresnel weights, texture lookups).

Run:  python examples/inverse_render.py [--steps 40] [--size 48]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ptx.core import rng as prng
from ptx.integrate.camera import Camera, sample_rays
from ptx.integrate.trace import compile_scene, trace_rays
from ptx.scenes.builders import baseline_config1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-2)
    args = ap.parse_args()

    scene = compile_scene(baseline_config1())
    cam = Camera(args.size, args.size)
    key = jax.random.PRNGKey(0)

    def render(params, k):
        o, d = sample_rays(cam, k, jnp.arange(args.size),
                           jnp.arange(args.size), args.spp)
        return trace_rays(scene, params, o, d, k, depth=4).mean(axis=0)

    target = jax.jit(render)(scene.params, key)

    # perturb: sphere radius, diffuse reflect color, sky emissive
    params = dict(scene.params)
    params["sphere_radius"] = params["sphere_radius"] * 1.25
    params["const"] = params["const"].at[0].add(-0.25)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        def loss_fn(p):
            img = render(p, k)
            return jnp.mean((img - target) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    true_r = float(np.asarray(scene.params["sphere_radius"])[0])
    print(f"target radius={true_r:.4f}  "
          f"start={float(np.asarray(params['sphere_radius'])[0]):.4f}")
    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state,
                                       prng.fold(key, i + 1))
        if i % 5 == 0 or i == args.steps - 1:
            r = float(np.asarray(params["sphere_radius"])[0])
            print(f"step {i:3d}  loss={float(loss):.6f}  radius={r:.4f}")
    print(f"done in {time.time() - t0:.1f}s; "
          f"radius error {abs(float(np.asarray(params['sphere_radius'])[0]) - true_r):.4f}")


if __name__ == "__main__":
    main()
