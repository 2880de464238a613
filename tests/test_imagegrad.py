"""image_gather (ptx.ops.imagegrad): forward semantics, fallback
transpose, and the MXU histogram kernel vs a scatter oracle.

The kernel itself is checked in interpret mode on ONE small call (no
scan — interpret-mode pallas is slow on CPU); the compiled path runs in
the TPU-marked test and, transitively, in bench.py and the parity
harness (the sky texture gather routes through it)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptx.ops import imagegrad


def _case(H=8, W=16, C=4, N=1024, seed=0):
    r = np.random.default_rng(seed)
    yi = r.integers(-2, H + 2, N).astype(np.int32)      # some out of bounds
    xi = r.integers(-2, W + 2, N).astype(np.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xc = np.clip(xi, 0, W - 1)
    yc = np.clip(yi, 0, H - 1)
    vals = r.normal(size=(N, C)).astype(np.float32)
    img = r.normal(size=(H, W, C)).astype(np.float32)
    return img, xi, yi, xc, yc, inb, vals


def _scatter_oracle(H, W, C, yc, xc, inb, vals):
    out = np.zeros((H, W, C), np.float32)
    for n in range(len(yc)):
        if inb[n]:
            out[yc[n], xc[n]] += vals[n]
    return out


def test_forward_matches_masked_gather():
    img, xi, yi, xc, yc, inb, _ = _case()
    got = imagegrad.image_gather(jnp.asarray(img), jnp.asarray(xc),
                                 jnp.asarray(yc), jnp.asarray(inb))
    want = np.where(inb[:, None], img[yc, xc], 0.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


def test_fallback_grad_matches_scatter_oracle():
    img, xi, yi, xc, yc, inb, vals = _case()

    def loss(im):
        out = imagegrad.image_gather(im, jnp.asarray(xc), jnp.asarray(yc),
                                     jnp.asarray(inb))
        return jnp.sum(out * jnp.asarray(vals))

    g = jax.grad(loss)(jnp.asarray(img))
    want = _scatter_oracle(*img.shape, yc, xc, inb, vals)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6, atol=1e-6)


def test_hist_kernel_interpret_matches_oracle():
    img, xi, yi, xc, yc, inb, vals = _case()
    H, W, C = img.shape
    hist = imagegrad._build_hist(H, W, C, interpret=True)
    y = jnp.where(jnp.asarray(inb), jnp.asarray(yc), -1).astype(jnp.float32)
    x = jnp.asarray(xc, jnp.float32)
    got = hist(y, x, jnp.asarray(vals))
    want = _scatter_oracle(H, W, C, yc, xc, inb, vals)
    # kernel accumulates via a bf16 hi/lo MXU split: ~2^-17 relative
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=3e-5)


def test_hist_kernel_multi_tile_interpret():
    """Two grid steps + non-multiple-of-8 H + W > 128 (two lane blocks of
    one-hot columns) in one small interpret call."""
    img, xi, yi, xc, yc, inb, vals = _case(H=5, W=130, C=3, N=2048, seed=3)
    H, W, C = img.shape
    hist = imagegrad._build_hist(H, W, C, interpret=True)
    y = jnp.where(jnp.asarray(inb), jnp.asarray(yc), -1).astype(jnp.float32)
    x = jnp.asarray(xc, jnp.float32)
    got = hist(y, x, jnp.asarray(vals))
    want = _scatter_oracle(H, W, C, yc, xc, inb, vals)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=3e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-kernel path needs the TPU")
def test_compiled_grad_matches_scatter_oracle_tpu():
    img, xi, yi, xc, yc, inb, vals = _case(H=64, W=128, C=4, N=4096, seed=1)

    def loss(im):
        out = imagegrad.image_gather(im, jnp.asarray(xc), jnp.asarray(yc),
                                     jnp.asarray(inb))
        return jnp.sum(out * jnp.asarray(vals))

    g = jax.jit(jax.grad(loss))(jnp.asarray(img))
    want = _scatter_oracle(*img.shape, yc, xc, inb, vals)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=3e-5)


def test_binned_hist_interpret_matches_oracle():
    """The 2-D binned large-image kernel (arbitrary H×W — the 3k-probe
    transpose): one small interpret call covering multiple y/x blocks,
    out-of-bounds sentinels, and partial edge blocks."""
    img, xi, yi, xc, yc, inb, vals = _case(H=100, W=600, C=4, N=2048,
                                           seed=5)
    H, W, C = img.shape
    hist = imagegrad._build_banded_hist(H, W, C, interpret=True)
    y = jnp.where(jnp.asarray(inb), jnp.asarray(yc), -1).astype(jnp.float32)
    x = jnp.asarray(xc, jnp.float32)
    got = hist(y, x, jnp.asarray(vals))
    want = _scatter_oracle(H, W, C, yc, xc, inb, vals)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=3e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled binned kernel needs the TPU")
def test_binned_hist_compiled_matches_oracle_tpu():
    img, xi, yi, xc, yc, inb, vals = _case(H=1536, W=3072, C=4, N=65536,
                                           seed=6)

    def loss(im):
        out = imagegrad.image_gather(im, jnp.asarray(xc), jnp.asarray(yc),
                                     jnp.asarray(inb))
        return jnp.sum(out * jnp.asarray(vals))

    g = jax.jit(jax.grad(loss))(jnp.asarray(img))
    want = _scatter_oracle(*img.shape, yc, xc, inb, vals)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=3e-5)


def test_coarse_estimator_bin_totals_exact():
    """PTX_IMG_GRAD_COARSE semantics (round 5): the opt-in coarse-bin
    sky-gradient estimator accumulates cotangents at k×k-coarsened
    resolution and spreads each bin's mass uniformly — per-BIN totals
    must equal the exact transpose's (that is the estimator's contract;
    per-texel values are deliberately the bin average).  Checked against
    the scatter oracle via the same interpret-mode histogram the
    backward uses (ONE call, CLAUDE.md interpret-cost rule)."""
    k = 8
    H, W, C = 32, 48, 3
    img, xi, yi, xc, yc, inb, vals = _case(H=H, W=W, C=C,
                                           N=imagegrad._LANES, seed=9)
    vals = vals[:, :C]
    Hc, Wc = H // k, W // k
    hist = imagegrad._build_hist(Hc, Wc, C, interpret=True)
    y = jnp.asarray(np.where(inb, yc // k, -1), jnp.float32)
    x = jnp.asarray(xc // k, jnp.float32)
    g = np.asarray(hist(y, x, jnp.asarray(vals))) / (k * k)
    gf = np.repeat(np.repeat(g, k, 0), k, 1)[:H, :W]

    exact = _scatter_oracle(H, W, C, yc, xc, inb, vals)
    bt_exact = exact.reshape(Hc, k, Wc, k, C).sum((1, 3))
    bt_coarse = gf.reshape(Hc, k, Wc, k, C).sum((1, 3))
    np.testing.assert_allclose(bt_coarse, bt_exact, rtol=2e-5, atol=1e-4)
