"""Image-texture gather with an MXU-histogram backward.

``img[yi, xi]`` is a nearest-texel gather; XLA transposes it to a
scatter-add into the image, and TPU scatters serialize — measured at
2.34 ms of the 13.5 ms bench step (tools/step_breakdown.py, round 2),
the single largest remaining cost after the fused bounce kernels.

:func:`image_gather` keeps the cheap gather forward and hand-writes the
transpose as a Pallas **histogram kernel**: for each 8×128 lane tile it
builds, per sublane row, a one-hot row mask ``OHy (H, 128)`` and a
column-one-hot × value matrix ``Wv (C·W, 128)``, and accumulates
``OHy @ Wvᵀ`` into a VMEM-resident ``(H, C·W)`` accumulator with the
MXU — the whole image cotangent never touches HBM until the final
block write, and nothing serializes.  (Same one-hot-transpose idea as
ptx.ops.tableops, which is limited to tables small enough to
materialize ``(B, R)`` one-hots in XLA; the kernel form keeps the
one-hot in VMEM so R = H·W in the thousands is fine.)

Eligible when running on TPU and the padded ``(H, C·W)`` accumulator +
``(C·W, 128)`` operand stay comfortably in VMEM (H ≤ 1024,
C·W_pad ≤ 2048); anything larger falls back to the scatter-add
transpose (exactly what plain autodiff produced before).

Semantics (forward) match ptx.shade.textures._get_pixel's gather:
out-of-bounds lanes return 0 on every channel
(/root/reference/src/image.cpp:366-396 bounds behavior); the index
clip/bounds test is done by the caller, which passes ``inb``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T_ROWS = 8          # f32 min tile: lane blocks are (8, 128) = 1024 lanes
_LANES = _T_ROWS * 128


def _hist_kernel(y_ref, x_ref, *refs, H, W_pad, C):
    """Accumulate Σ_lanes onehot(y) ⊗ onehot(x) ⊗ val into acc (H, C·W_pad).

    Column layout: j = c·W_pad + x.  Lanes with y outside [0, H) (the
    caller's out-of-bounds / padding sentinel −1) match no one-hot row
    and contribute nothing.
    """
    val_refs, acc_ref = refs[:-1], refs[-1]
    first = pl.program_id(0) == 0

    # Mosaic iota must be integer-typed; compares happen in f32 (exact for
    # texel indices ≪ 2²⁴)
    iota_h = jax.lax.broadcasted_iota(
        jnp.int32, (H, 128), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(
        jnp.int32, (W_pad, 128), 0).astype(jnp.float32)

    acc = jnp.zeros((H, C * W_pad), jnp.float32)
    dims = (((1,), (1,)), ((), ()))
    for s in range(_T_ROWS):
        y_row = y_ref[s:s + 1, :]                     # (1, 128) f32
        x_row = x_ref[s:s + 1, :]
        ohy = jnp.where(iota_h == jnp.broadcast_to(y_row, (H, 128)),
                        1.0, 0.0).astype(jnp.bfloat16)  # (H, 128), exact
        ohx = jnp.where(iota_w == jnp.broadcast_to(x_row, (W_pad, 128)),
                        1.0, 0.0)                     # (W_pad, 128)
        wv = jnp.concatenate(
            [ohx * jnp.broadcast_to(val_refs[c][s:s + 1, :], (W_pad, 128))
             for c in range(C)], axis=0)              # (C·W_pad, 128)
        # hi/lo bf16 split: two DEFAULT-precision MXU passes instead of
        # HIGHEST's ~3 (single-pass bf16 alone measured 1.1e-2 abs error
        # on unit gradients; hi+lo carries values to ~2⁻¹⁷ relative —
        # the one-hot operand is bf16-exact)
        wv_hi = wv.astype(jnp.bfloat16)
        wv_lo = (wv - wv_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + (jax.lax.dot_general(
                         ohy, wv_hi, dims,
                         preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(
                         ohy, wv_lo, dims,
                         preferred_element_type=jnp.float32))

    prev = jnp.where(first, jnp.zeros_like(acc), acc_ref[...])
    acc_ref[...] = prev + acc


def _build_hist(H, W, C, interpret):
    """hist(y, x, vals) -> (H, W, C): y/x are f32 flat (N,) texel indices
    (−1 ⇒ skip), vals (N, C) f32.  N must be a multiple of 1024."""
    W_pad = -(-W // 128) * 128
    H_pad = -(-H // 8) * 8

    kern = functools.partial(_hist_kernel, H=H_pad, W_pad=W_pad, C=C)

    @jax.jit
    def hist(y, x, vals):
        n = y.shape[0]
        shape2 = (n // 128, 128)
        grid = n // _LANES
        block = pl.BlockSpec((_T_ROWS, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        acc_spec = pl.BlockSpec((H_pad, C * W_pad), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        arrs = [y.reshape(shape2), x.reshape(shape2)]
        arrs += [vals[:, c].reshape(shape2) for c in range(C)]
        acc = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[block] * (2 + C),
            out_specs=acc_spec,
            out_shape=jax.ShapeDtypeStruct((H_pad, C * W_pad), jnp.float32),
            interpret=interpret,
        )(*arrs)
        # (H_pad, C·W_pad) → (H, C, W) → (H, W, C)
        return acc.reshape(H_pad, C, W_pad)[:H, :, :W].transpose(0, 2, 1)

    return hist


def _hist_eligible(H, W, C):
    return H <= 1024 and C * (-(-W // 128) * 128) <= 2048


@jax.custom_vjp
def image_gather(img, xi, yi, inb):
    """Bounds-masked nearest gather: ``where(inb, img[yi, xi], 0)``.

    ``img`` (H, W, C) float32; ``xi``/``yi`` int32 of any shape, already
    clipped into range by the caller; ``inb`` bool marks lanes whose
    *unclipped* index was inside.  Differentiable w.r.t. ``img`` only;
    the transpose is the MXU histogram kernel on TPU (module docstring).
    """
    return jnp.where(inb[..., None], img[yi, xi], 0.0)


def _fwd(img, xi, yi, inb):
    return image_gather(img, xi, yi, inb), (img.shape, xi, yi, inb)


def _bwd(res, ct):
    shape, xi, yi, inb = res
    H, W, C = shape
    ct = jnp.where(inb[..., None], ct, 0.0)
    use_kernel = (jax.default_backend() == "tpu"
                  and _hist_eligible(H, W, C))
    if use_kernel:
        y = jnp.where(inb, yi, -1).astype(jnp.float32).reshape(-1)
        x = xi.astype(jnp.float32).reshape(-1)
        vals = ct.reshape(-1, C)
        n = y.shape[0]
        pad = (-n) % _LANES
        if pad:
            y = jnp.concatenate([y, jnp.full((pad,), -1.0, jnp.float32)])
            x = jnp.concatenate([x, jnp.zeros((pad,), jnp.float32)])
            vals = jnp.concatenate(
                [vals, jnp.zeros((pad, C), jnp.float32)])
        hist = _build_hist(H, W, C, interpret=False)
        d_img = hist(y, x, vals)
    else:
        d_img = jnp.zeros(shape, ct.dtype).at[yi, xi].add(ct)
    return d_img, None, None, None


image_gather.defvjp(_fwd, _bwd)
