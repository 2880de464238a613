"""Integration renders using the reference repo's committed assets —
exercises the cubemap-skybox and mirror-ball probe sky paths end-to-end
(makeSkyBox / makeSkyMirrorSphere, test.cpp:88-100) with real data."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.integrate.camera import Camera
from ptx.integrate.trace import compile_scene, trace_rays
from ptx.io import hdr, png
from ptx.scenes import builders
from ptx.geom.tape import Sphere, Union
from ptx.shade.materials import Material

REF = "/root/reference"

needs_assets = pytest.mark.skipif(
    not os.path.exists(f"{REF}/sky01/top.png"),
    reason="reference assets unavailable")


@needs_assets
def test_cubemap_skybox_world_renders():
    faces = {k: png.read_float(f"{REF}/sky01/{k}.png")
             for k in ("top", "bottom", "left", "right", "front", "back")}
    sky = builders.make_sky_box(faces)
    mirror = Material(reflect=0.95, scatter=0.0)
    world = Union(Sphere((0.0, 0.0, -4.0), 1.0, mirror),
                  *builders.sky_planes(sky))
    scene = compile_scene(world)
    n = 64
    g = np.random.default_rng(0)
    d = jnp.asarray(np.stack([g.uniform(-1, 1, n), g.uniform(-1, 1, n),
                              -np.ones(n)], -1).astype(np.float32))
    out = np.asarray(jax.jit(
        lambda p, o, d: trace_rays(scene, p, o, d, jax.random.PRNGKey(0),
                                   depth=4))(scene.params, jnp.zeros((n, 3)),
                                             d))
    assert np.isfinite(out).all()
    assert out.mean() > 0.05          # daylight cubemap reaches the film
    assert out.std() > 0.01           # and it is directionally varying


@needs_assets
def test_mirror_ball_probe_sky_renders():
    probe = hdr.read(f"{REF}/test.hdr")
    sky = builders.make_sky_mirror_sphere(probe, scale=(1.0, 1.0, 1.0))
    world = Union(Sphere((0.0, 0.0, -4.0), 0.8,
                         Material(reflect=0.8, scatter=1.0)),
                  *builders.sky_planes(sky))
    scene = compile_scene(world)
    n = 48
    g = np.random.default_rng(1)
    d = jnp.asarray(np.stack([g.uniform(-1, 1, n), g.uniform(-1, 1, n),
                              -np.ones(n)], -1).astype(np.float32))
    out = np.asarray(jax.jit(
        lambda p, o, d: trace_rays(scene, p, o, d, jax.random.PRNGKey(1),
                                   depth=3))(scene.params, jnp.zeros((n, 3)),
                                             d))
    assert np.isfinite(out).all()
    assert out.mean() > 1e-4
