"""Fused emission kernel (ptx.ops.emission_kernel) vs the XLA chain
(materials.eval_emissive) on the demo scene.

Positions are built by INVERTING the sky chain's uv map at texel-cell
centers: the kernel's polynomial acos can differ from XLA's arctan2 by
~1e-7, which flips the chosen texel only within ~1e-7 of a texel
boundary — interior targets make the comparison exact instead of
statistically-almost-exact.  One interpret-mode kernel call per test
(no scans — interpret pallas is slow on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.integrate import trace as tr
from ptx.scenes.builders import make_world


@pytest.fixture(scope="module")
def scene():
    import os
    old_p, old_f = os.environ.get("PTX_PALLAS"), os.environ.get("PTX_FUSED")
    os.environ["PTX_PALLAS"] = "1"
    os.environ["PTX_FUSED"] = "1"
    os.environ["PTX_EMK"] = "1"      # round 3: default prefers sky-select
    try:
        s = tr.compile_scene(make_world())
    finally:
        os.environ.pop("PTX_EMK", None)
        for k, v in (("PTX_PALLAS", old_p), ("PTX_FUSED", old_f)):
            os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)
    assert s.emission_fn is not None, "demo scene should be eligible"
    return s


def _interior_positions(scene, n, seed=0):
    """Positions whose sky-chain uv lands at texel-cell centers."""
    from ptx.ops.emission_kernel import parse_chain
    mfn = scene.material_fn
    dyn_mi, spec = mfn.emissive_dynamic_specs[0]
    xform_idx, factor_idx, kind, img_id = parse_chain(spec)
    img = np.asarray(scene.params["images"][img_id])
    H, W = img.shape[0], img.shape[1]

    r = np.random.default_rng(seed)
    u = (r.integers(0, W, n) + 0.5) / W
    w = (r.integers(0, H, n) + 0.5) / H
    # invert: u = θ/2π + ½, w = φ/(π/2)·½ + ½  (textures._spherical_uv)
    theta = (u - 0.5) * 2.0 * np.pi
    phi = (w - 0.5) * np.pi
    d = np.stack([np.cos(phi) * np.cos(theta),
                  np.cos(phi) * np.sin(theta),
                  np.sin(phi)], -1) * r.uniform(5.0, 50.0, (n, 1))
    if xform_idx is not None:
        A = np.asarray(scene.params["tex_xform"][xform_idx])
        L, t = A[:, :3], A[:, 3]
        d = (np.linalg.inv(L) @ (d - t).T).T
    return jnp.asarray(d.astype(np.float32)), dyn_mi


def test_matches_xla_chain(scene):
    n = 1024
    pos, dyn_mi = _interior_positions(scene, n)
    r = np.random.default_rng(1)
    mid = jnp.asarray(r.integers(0, scene.n_materials, n).astype(np.int32))
    got = scene.emission_fn(scene.params, pos, mid)
    want = scene.material_fn.eval_emissive(scene.params, pos, mid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _compile_fused(root):
    import os
    old_p, old_f = os.environ.get("PTX_PALLAS"), os.environ.get("PTX_FUSED")
    os.environ["PTX_PALLAS"] = "1"
    os.environ["PTX_FUSED"] = "1"
    os.environ["PTX_EMK"] = "1"      # round 3: default prefers sky-select
    try:
        return tr.compile_scene(root)
    finally:
        os.environ.pop("PTX_EMK", None)
        for k, v in (("PTX_PALLAS", old_p), ("PTX_FUSED", old_f)):
            os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)


def test_mirror_ball_chain():
    """The kernel's mirror-ball branch (the demo only exercises
    spherical): a mirror-probe sky world vs the XLA chain."""
    from ptx.geom.tape import Sphere
    from ptx.scenes.builders import (Material, make_sky_mirror_sphere,
                                     sky_planes, union_array)

    r = np.random.default_rng(7)
    probe = r.uniform(0.0, 2.0, (16, 32, 4)).astype(np.float32)
    sky = make_sky_mirror_sphere(probe, scale=(1.5, 1.0, 0.5))
    world = union_array([Sphere((0.0, 0.0, -4.0), 1.0,
                                Material(reflect=0.8, scatter=1.0))]
                        + sky_planes(sky))
    s = _compile_fused(world)
    assert s.emission_fn is not None

    n = 1024
    # directions away from mirror-ball uv-boundaries: random but with the
    # boundary-adjacent lanes compared loosely
    d = r.normal(size=(n, 3)).astype(np.float32) * 20.0
    mid = jnp.asarray(r.integers(0, s.n_materials, n).astype(np.int32))
    got = np.asarray(s.emission_fn(s.params, jnp.asarray(d), mid))
    want = np.asarray(s.material_fn.eval_emissive(s.params,
                                                  jnp.asarray(d), mid))
    close = np.isclose(got, want, rtol=1e-4, atol=1e-4).all(axis=-1)
    # allow a tiny fraction of texel flips at cell boundaries (acos vs
    # arctan2 differ by ~1e-7)
    assert close.mean() > 0.995, float(close.mean())


def test_unsupported_chain_falls_back():
    """A Skybox emissive (cubemap) is not kernel-eligible → no
    emission_fn, XLA path serves."""
    from ptx.geom.tape import Sphere
    from ptx.scenes.builders import (Material, make_sky_box, sky_planes,
                                     union_array)

    r = np.random.default_rng(8)
    face = r.uniform(0.0, 1.0, (8, 8, 4)).astype(np.float32)
    sky = make_sky_box({k: face for k in
                        ("top", "bottom", "left", "right", "front", "back")})
    world = union_array([Sphere((0.0, 0.0, -4.0), 1.0,
                                Material(reflect=0.8, scatter=1.0))]
                        + sky_planes(sky))
    s = _compile_fused(world)
    assert s.emission_fn is None


def test_gradients_match_xla_chain(scene):
    n = 1024
    pos, dyn_mi = _interior_positions(scene, n, seed=2)
    r = np.random.default_rng(3)
    mid = jnp.asarray(r.integers(0, scene.n_materials, n).astype(np.int32))
    wgt = jnp.asarray(r.uniform(0.2, 1.0, (n, 3)).astype(np.float32))

    def loss(fn, params):
        return jnp.sum(fn(params, pos, mid) * wgt)

    gk = jax.grad(lambda p: loss(scene.emission_fn, p))(scene.params)
    gx = jax.grad(lambda p: loss(scene.material_fn.eval_emissive,
                                 p))(scene.params)
    for k in ("const", "factor"):
        np.testing.assert_allclose(np.asarray(gk[k]), np.asarray(gx[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for i, (a, b) in enumerate(zip(gk["images"], gx["images"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"images[{i}]")
