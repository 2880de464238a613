"""Texture lookup semantics vs the reference formulas
(image_texture.h / transform_texture.h / filter_texture.h / texture.h)."""

import math

import numpy as np
import jax.numpy as jnp

from ptx.shade import textures as tx
from ptx.shade.materials import Material, compile_material_table


def eval_tex(tex, pos):
    c = tx.TextureCompiler()
    fn = c.compile(tex)
    params = c.finalize()
    return np.asarray(fn(params, jnp.asarray(pos, jnp.float32)))


def test_constant():
    out = eval_tex(tx.Constant((0.2, 0.4, 0.6)), [[0, 0, 0], [9, 9, 9]])
    np.testing.assert_allclose(out, [[0.2, 0.4, 0.6]] * 2, rtol=1e-6)


def _img(h, w):
    rng = np.random.default_rng(0)
    return rng.uniform(0, 1, (h, w, 4)).astype(np.float32)


def test_image_lookup_wrap_flip_nearest():
    img = _img(4, 8)
    # pos (x, y): x wraps via x-floor(x); y flips: row = floor((1-frac(y))*H)
    out = eval_tex(tx.ImageTex(img), [[0.1, 0.3, 0.0]])
    xi = int(np.floor(0.1 * 8))
    yi = int(np.floor((1 - 0.3) * 4))
    np.testing.assert_allclose(out[0], img[yi, xi, :3], rtol=1e-6)


def test_image_integral_y_out_of_bounds_black():
    # y integral → frac 0 → flipped to 1 → row H → out of bounds → black
    # (image_texture.h:20-27 with image.cpp:366-380 bounds check)
    img = _img(4, 8) + 1.0
    out = eval_tex(tx.ImageTex(img), [[0.5, 1.0, 0.0]])
    np.testing.assert_allclose(out[0], 0.0)


def test_image_alpha_texture():
    img = _img(4, 4)
    out = eval_tex(tx.ImageTex(img, alpha=True), [[0.3, 0.4, 0.0]])
    xi = int(np.floor(0.3 * 4)); yi = int(np.floor(0.6 * 4))
    np.testing.assert_allclose(out[0], img[yi, xi, 3], rtol=1e-6)


def test_skybox_face_selection():
    faces = {k: np.full((2, 2, 4), v, np.float32) for v, k in enumerate(
        ("top", "bottom", "left", "right", "front", "back"))}
    sb = tx.Skybox(**faces)
    dirs = {
        (0.0, 1.0, 0.0): 0.0,    # +y → top
        (0.0, -1.0, 0.0): 1.0,   # −y → bottom
        (-1.0, 0.0, 0.0): 2.0,   # −x → left
        (1.0, 0.0, 0.0): 3.0,    # +x → right
        (0.0, 0.0, 1.0): 4.0,    # +z → front
        (0.0, 0.0, -1.0): 5.0,   # −z → back
    }
    for d, want in dirs.items():
        out = eval_tex(sb, [list(d)])
        np.testing.assert_allclose(out[0], want, err_msg=str(d))
    # zero direction → black (image_texture.h:92-93)
    np.testing.assert_allclose(eval_tex(sb, [[0.0, 0.0, 0.0]])[0], 0.0)


def test_spherical_coords_mapping():
    # transform_texture.h:73-85: u = atan2(y,x)/2π+0.5, v = asin(z)/π+0.5
    img = _img(8, 16)
    out = eval_tex(tx.SphericalCoords(tx.ImageTex(img)),
                   [[1.0, 0.0, 0.0]])
    u, v = 0.5, 0.5
    xi = int(np.floor((u % 1.0) * 16)); yi = int(np.floor((1 - v % 1.0) * 8))
    np.testing.assert_allclose(out[0], img[yi, xi, :3], rtol=1e-6)


def test_mirror_ball_center_is_back_pole():
    # +z maps to probe center (0.5, 0.5): d = sqrt(2+2z) = 2, uv = (.5,.5)
    img = _img(9, 9)
    out = eval_tex(tx.MirrorBall(tx.ImageTex(img)), [[0.0, 0.0, 1.0]])
    xi = int(np.floor(0.5 * 9)); yi = int(np.floor(0.5 * 9))
    np.testing.assert_allclose(out[0], img[yi, xi, :3], rtol=1e-6)


def test_multiply_and_log_filters():
    base = tx.Constant((2.0, 4.0, 1e-31))
    out = eval_tex(tx.Multiply((0.5, 0.25, 3.0), base), [[0, 0, 0]])
    np.testing.assert_allclose(out[0], [1.0, 1.0, 3e-31], rtol=1e-5)
    # LogTexture: 0.5 + log2(v)/256, 0 below 1e-30 (filter_texture.h:62-67)
    out = eval_tex(tx.Log(base), [[0, 0, 0]])
    np.testing.assert_allclose(
        out[0], [0.5 + 1 / 256, 0.5 + 2 / 256, 0.0], rtol=1e-5)


def test_transformed_texture_lookup():
    img = _img(4, 4)
    from ptx.core import linalg
    shift = np.asarray(linalg.translate((0.25, 0.0, 0.0)))
    out = eval_tex(tx.TransformedTex(shift, tx.ImageTex(img)),
                   [[0.1, 0.3, 0.0]])
    want = eval_tex(tx.ImageTex(img), [[0.35, 0.3, 0.0]])
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_transform_texture_helper_composition():
    # transform(A, TransformedTex(m, t)) looks up at m(A(pos))
    img = _img(4, 4)
    from ptx.core import linalg
    a = np.asarray(linalg.translate((0.25, 0.0, 0.0)))
    m = np.asarray(linalg.scale((2.0, 1.0, 1.0)))
    nested = tx.transform_texture(a, tx.TransformedTex(m, tx.ImageTex(img)))
    assert isinstance(nested, tx.TransformedTex)
    out = eval_tex(nested, [[0.1, 0.3, 0.0]])
    want = eval_tex(tx.ImageTex(img), [[(0.1 + 0.25) * 2.0, 0.3, 0.0]])
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_material_table_scalar_slots_are_channel_means():
    m1 = Material(reflect=(0.3, 0.6, 0.9), scatter=(0.2, 0.4, 0.6))
    m2 = Material(reflect=0.1, scatter=1.0, ior=1.5)
    comp = tx.TextureCompiler()
    extra, fn = compile_material_table([m1, m2], comp)
    params = comp.finalize()
    params.update(extra)
    pos = jnp.zeros((2, 3))
    out = fn(params, pos, jnp.array([0, 1]))
    np.testing.assert_allclose(np.asarray(out["scatter_f"]),
                               [0.4, 1.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["reflect"][0]),
                               [0.3, 0.6, 0.9], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["ior"]), [1.0, 1.5], rtol=1e-6)
