"""Scene builders, JSON spec, camera, and adaptive sampler."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.core import linalg
from ptx.integrate.adaptive import render_adaptive
from ptx.integrate.camera import Camera, pixel_rays
from ptx.integrate.trace import compile_scene, trace_rays
from ptx.scenes import builders
from ptx.scenes.spec import SceneSpec, parse_transform


def test_camera_reference_mapping():
    cam = Camera(640, 480, 4.0 / 3.0, 1.0, 2.0)
    o, d = pixel_rays(cam, jnp.array([320.0]), jnp.array([240.0]))
    np.testing.assert_allclose(np.asarray(o)[0], 0.0)
    np.testing.assert_allclose(np.asarray(d)[0], [0.0, 0.0, -2.0], atol=1e-6)
    o, d = pixel_rays(cam, jnp.array([0.0]), jnp.array([0.0]))
    np.testing.assert_allclose(np.asarray(d)[0], [-4.0 / 3.0, 1.0, -2.0],
                               rtol=1e-6)


def test_camera_demo_parameterization():
    # test.cpp:450: screen size = pixel dims, distance = 2*min(W, H)
    cam = Camera.reference_demo(1920, 1080)
    assert cam.screen_width == 1920.0
    assert cam.screen_distance == 2160.0


def test_all_builtin_scenes_compile():
    for fn in (builders.baseline_config1, builders.baseline_config2,
               builders.baseline_config3, builders.baseline_config4,
               builders.make_world):
        scene = compile_scene(fn())
        assert scene.n_materials >= 2
        for leaf in jax.tree.leaves(scene.params):
            assert np.isfinite(np.asarray(leaf)).all()


def test_make_lens_geometry():
    from ptx.geom.tape import Intersection
    m = builders.Material(reflect=0.7, scatter=0.0, transmit=0.9, ior=1.3,
                          transmit_reflect=1.0)
    lens = builders.make_lens((0, 0, -2), (0, 0, -1), 0.5, 1.0, m)
    assert isinstance(lens, Intersection)
    a, b = lens.objects
    # sphere centers straddle the lens plane by sqrt(R² − r²)
    gap = np.linalg.norm(np.asarray(a.center) - np.asarray(b.center))
    np.testing.assert_allclose(gap, 2 * np.sqrt(1.0 - 0.25), rtol=1e-6)


def test_scene_spec_roundtrip(tmp_path):
    doc = {
        "materials": {
            "d": {"reflect": [0.8, 0.2, 0.2], "scatter": 1.0},
            "sky": {"reflect": 0, "scatter": 0, "emissive": [1, 1, 1]},
        },
        "world": {"type": "union", "objects": [
            {"type": "sphere", "center": [0, 0, -4], "radius": 1.0,
             "material": "d"},
            {"type": "transformed",
             "transform": [{"translate": [0, 0.5, 0]}, {"scale": 1.0}],
             "object": {"type": "sphere", "center": [2, 0, -5],
                        "radius": 0.5, "material": "d"}},
            {"type": "difference",
             "a": {"type": "sphere", "center": [-2, 0, -5], "radius": 0.8,
                   "material": "d"},
             "b": {"type": "plane", "normal": [0, 1, 0], "d": 0.2,
                   "material": "d"}},
            {"type": "plane", "normal": [0, 0, -1], "d": 50.0,
             "material": "sky"},
        ]},
        "camera": {"width": 8, "height": 8},
        "render": {"spp": 2, "depth": 2},
    }
    p = tmp_path / "s.json"
    p.write_text(json.dumps(doc))
    world, cam, opts = SceneSpec.load(p).build()
    assert cam.width == 8 and opts["spp"] == 2
    scene = compile_scene(world)
    o = jnp.zeros((4, 3))
    d = jnp.asarray([[0, 0, -1.0]] * 4, jnp.float32)
    out = trace_rays(scene, scene.params, o, d, jax.random.PRNGKey(0), depth=2)
    assert np.isfinite(np.asarray(out)).all()


def test_parse_transform_composition():
    t = parse_transform([{"translate": [1.0, 0, 0]},
                         {"scale": [2.0, 1.0, 1.0]}])
    # list applies left-to-right: v → translate(scale(v))? NO:
    # compose(out, s) has action out∘s — first element is outermost
    v = linalg.apply(jnp.asarray(t), jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [3.0, 0.0, 0.0], rtol=1e-6)


def test_adaptive_concentrates_samples():
    scene = compile_scene(builders.baseline_config1())
    cam = Camera(16, 16)
    img, counts, _ = render_adaptive(scene, cam, jax.random.PRNGKey(0),
                                  spp_base=2, rounds=2, frac=0.1,
                                  spp_refine=4, depth=3)
    img = np.asarray(img); counts = np.asarray(counts)
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    assert counts.min() == 2            # base everywhere
    assert counts.max() >= 6            # refined somewhere
    assert (counts > 2).sum() <= 2 * int(16 * 16 * 0.1) + 1
