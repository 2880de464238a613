"""Fused emission megakernel: direction-map trig + image lookup + const
table select in ONE Pallas launch, with an MXU one-hot VMEM gather.

Why.  After the bounce megakernels and the packed compaction, the
profiler put the remaining step cost in the post-scan emission chain:
the (N,4) image gather (1.2 ms at N≈264k — TPU gathers cost ~4-9 ns per
ROW), the const-table gather + the layout copies XLA inserts around it
(~0.7 ms), and the equirect trig fusions.  None of that is arithmetic —
the whole chain is ~300 ops/lane.

This kernel keeps every intermediate in VMEM/registers and replaces the
HBM row gather with an MXU contraction: the image lives in VMEM as a
stacked hi/lo bf16 split of ``img_r (H, 3·W_pad)`` (rgb only — alpha is
never read); per sublane, a one-hot over rows pulls each lane's image
ROW with two DEFAULT-precision matmuls (``M1[j, l] = Σ_y img_r[y, j] ·
1[y == y_l]``, hi + lo — the one-hot operand is bf16-exact and hi+lo
carries the image to ~2⁻¹⁶ relative, vs ~3 MXU passes for
precision=HIGHEST), and a one-hot over columns selects the texel with
VPU multiply-reduce.

Supported emissive chains (checked against the compile-time ``.spec``
chain recorded by ptx.shade.textures): exactly ONE dynamic emissive
material of the form ``[Transformed] → [Multiply] → Spherical|Mirror →
ImageTex(alpha=False)`` with the image small enough for VMEM
(H ≤ 512, 4·W_pad ≤ 4096); every other material's emissive slot must be
a Constant.  Anything else falls back to the XLA path
(materials.eval_emissive).  The trig uses the Mosaic-safe ``_acos``
(atan2/asin built from it, f32-accurate): texel indices can differ from
the XLA path only for directions within ~1e-7 of a texel boundary.

Reference semantics reproduced: transform_texture position transform
(texture.h:60-90), equirect / mirror-ball maps (transform_texture.h:
46-85), ImageTex wrap/flip/bounds (image_texture.h:18-28,
image.cpp:366-396), Multiply filter (filter_texture.h:30-48).

Backward: custom VJP — ONE MXU histogram call
(ptx.ops.imagegrad._build_hist) accumulates both the image cotangent
(bins [0, H)×[0, W)) and the const-table row cotangents (bins
[H, H+R) at x = 0, keyed by the kernel's per-lane row-id output);
d_factor comes from the kernel's masked-texel output.  Positions are
gradient-free through nearest-texel lookups (exactly zero a.e.), as is
the transform matrix (indices are integer).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptx.ops.bounce_kernel import _acos, _normalize3
from ptx.ops.imagegrad import _build_hist

_T_ROWS = 8
_LANES = _T_ROWS * 128


def parse_chain(spec):
    """Parse a texture ``.spec`` into (xform_idx|None, factor_idx|None,
    map_kind, img_id) or None if unsupported."""
    xform = factor = None
    kind = None
    node = spec
    while node is not None:
        tag = node[0]
        if tag == "xform" and kind is None and xform is None:
            xform, node = node[1], node[2]
        elif tag == "mul" and factor is None:
            factor, node = node[1], node[2]
        elif tag in ("spherical", "mirror") and kind is None:
            kind, node = tag, node[1]
        elif tag == "image" and kind is not None and not node[2]:
            return (xform, factor, kind, node[1])
        else:
            return None
    return None


def supported(material_fn, images) -> bool:
    """Eligibility: exactly one supported dynamic emissive chain,
    VMEM-sized image.  (Const-only scenes keep the XLA table lookup —
    it is already one cheap gather.)"""
    specs = getattr(material_fn, "emissive_dynamic_specs", [])
    if len(specs) != 1:
        return False
    chain = parse_chain(specs[0][1])
    if chain is None:
        return False
    img = images[chain[3]]
    H, W = img.shape[0], img.shape[1]
    return H <= 512 and 4 * (-(-W // 128) * 128) <= 4096


def build_emission_fn(material_fn, images):
    """Compile the fused emission evaluator for a scene's material table.

    ``images``: the compiler's finalized image list (shapes are baked
    into the kernel).  Returns ``em_fn(params, pos, mid) -> (N, 3)``
    (flat inputs), a drop-in for ``material_fn.eval_emissive`` on
    supported scenes, with a custom VJP (module docstring).
    """
    M = material_fn.n_materials
    const_rows = np.asarray(material_fn.const_idx["emissive"])   # (M,)
    specs = material_fn.emissive_dynamic_specs
    if specs:
        dyn_mi, spec = specs[0]
        xform_idx, factor_idx, map_kind, img_id = parse_chain(spec)
    else:
        dyn_mi, xform_idx, factor_idx, map_kind, img_id = -1, None, None, None, None
    if img_id is not None:
        IMG_H, IMG_W = images[img_id].shape[0], images[img_id].shape[1]
    else:
        IMG_H, IMG_W = 8, 8
    W_PAD = -(-IMG_W // 128) * 128
    H_PAD = -(-IMG_H // 8) * 8
    KX = W_PAD // 128

    # SMEM layout: [xform(12), factor(3), const_emissive(M*3)]
    P_total = 12 + 3 + M * 3

    def kernel(pp_ref, img_ref, px_ref, py_ref, pz_ref, mid_ref,
               em0_ref, em1_ref, em2_ref,
               tx0_ref, tx1_ref, tx2_ref,
               xi_ref, yi_ref, fl_ref, row_ref, *, H, W, W_pad, KX):
        P = lambda i: pp_ref[0, i]
        px, py, pz = px_ref[...], py_ref[...], pz_ref[...]
        mid = mid_ref[...]

        # position transform (texture.h:60-90)
        if xform_idx is not None:
            qx = P(0) * px + P(1) * py + P(2) * pz + P(3)
            qy = P(4) * px + P(5) * py + P(6) * pz + P(7)
            qz = P(8) * px + P(9) * py + P(10) * pz + P(11)
        else:
            qx, qy, qz = px, py, pz

        zero = (qx == 0.0) & (qy == 0.0) & (qz == 0.0)
        nx, ny, nz = _normalize3(qx, qy, qz)
        if map_kind == "spherical":
            # theta = atan2(ny, nx) via acos; phi = asin(nz) = π/2 − acos
            hyp2 = nx * nx + ny * ny
            hyp = jnp.sqrt(jnp.where(hyp2 == 0.0, 1.0, hyp2))
            ct = jnp.clip(nx / hyp, -1.0, 1.0)
            theta = jnp.where(hyp2 == 0.0, 0.0,
                              jnp.where(ny >= 0.0, 1.0, -1.0) * _acos(ct))
            phi = (jnp.float32(np.pi / 2)
                   - _acos(jnp.clip(nz, -1.0, 1.0)))
            u = theta * jnp.float32(0.5 / np.pi) + 0.5
            w = phi * jnp.float32(1.0 / (np.pi / 2.0)) * 0.5 + 0.5
            u = jnp.where(zero, 0.0, u)
            w = jnp.where(zero, 0.0, w)
        else:                    # mirror ball (transform_texture.h:46-59)
            dd = jnp.sqrt(jnp.maximum(2.0 + 2.0 * nz, 0.0))
            bad = (nz <= -1.0) | (dd == 0.0)
            safe_d = jnp.where(bad, 1.0, dd)
            u = jnp.where(bad, 0.0, nx / safe_d * 0.5 + 0.5)
            w = jnp.where(bad, 0.5, ny / safe_d * 0.5 + 0.5)
            u = jnp.where(zero, 0.0, u)
            w = jnp.where(zero, 0.0, w)

        # ImageTex wrap/flip/bounds (image_texture.h:18-28)
        x = u - jnp.floor(u)
        y = 1.0 - (w - jnp.floor(w))
        xi = jnp.floor(x * W)
        yi = jnp.floor(y * H)
        inb = (xi >= 0.0) & (xi < W) & (yi >= 0.0) & (yi < H)
        xc = jnp.clip(xi, 0.0, W - 1.0)
        yc = jnp.clip(yi, 0.0, H - 1.0)

        # img_ref: (2·H_pad, 3·W_pad) bf16 — stacked hi/lo split of the
        # f32 image.  The hi and lo halves are contracted in ONE
        # DEFAULT-precision MXU dot whose one-hot selects row y in BOTH
        # halves (``r % H_pad == y``): hi + lo then sum inside the MXU's
        # f32 accumulator, carrying the image to ~2⁻¹⁶ relative.  This
        # MUST NOT be two dots added afterwards — on this toolchain
        # ``dot(hi, oh) + dot(lo, oh)`` gets folded into one bf16 dot of
        # (hi + lo) computed IN BF16, which cancels the lo half exactly;
        # the shipped round-2 kernel did that and returned bf16-rounded
        # texels on hardware (caught by tools/tpu_golden.py: ~0.4%
        # relative error on every sky lane, ×32-scale absolute error on
        # near-sun texels — interpret mode does not fold, so CPU tests
        # passed).
        H_pad = img_ref.shape[0] // 2
        iota_h2 = jax.lax.broadcasted_iota(
            jnp.int32, (2 * H_pad, 128), 0).astype(jnp.float32)
        iota_h2 = iota_h2 - jnp.floor(
            iota_h2 / jnp.float32(H_pad)) * jnp.float32(H_pad)
        iota_x = jax.lax.broadcasted_iota(
            jnp.int32, (128, 128), 0).astype(jnp.float32)

        rows = [[], [], []]              # per-channel (1, 128) sublane rows
        for s in range(_T_ROWS):
            y_row = yc[s:s + 1, :]
            ohy2 = jnp.where(
                iota_h2 == jnp.broadcast_to(y_row, (2 * H_pad, 128)),
                1.0, 0.0).astype(jnp.bfloat16)
            # M1[j, l] = img_hi[y_l, j] + img_lo[y_l, j] — one MXU pass
            dims = (((0,), (0,)), ((), ()))
            m1 = jax.lax.dot_general(
                img_ref[...], ohy2, dims,
                preferred_element_type=jnp.float32)   # (3·W_pad, 128)
            x_row = jnp.broadcast_to(xc[s:s + 1, :], (128, 128))
            ohxs = [jnp.where(iota_x + jnp.float32(128 * xb) == x_row,
                              1.0, 0.0) for xb in range(KX)]
            for c in range(3):
                acc = jnp.zeros((1, 128), jnp.float32)
                for xb in range(KX):
                    blk = m1[c * W_pad + 128 * xb:
                             c * W_pad + 128 * (xb + 1), :]
                    acc = acc + jnp.sum(ohxs[xb] * blk, axis=0,
                                        keepdims=True)
                rows[c].append(acc)
        tex = [jnp.concatenate(rows[c], axis=0) for c in range(3)]

        f0, f1, f2 = ((P(12), P(13), P(14)) if factor_idx is not None
                      else (1.0, 1.0, 1.0))
        inb_f = jnp.where(inb, 1.0, 0.0)
        t0, t1, t2 = tex[0] * inb_f, tex[1] * inb_f, tex[2] * inb_f
        d0, d1, d2 = t0 * f0, t1 * f1, t2 * f2

        # const-emissive rows by material one-hot (SMEM); ``row`` is the
        # lane's const-table row id (static map), consumed by the
        # backward's combined histogram
        c0 = jnp.zeros(px.shape, jnp.float32)
        c1 = jnp.zeros(px.shape, jnp.float32)
        c2 = jnp.zeros(px.shape, jnp.float32)
        row = jnp.zeros(px.shape, jnp.float32)
        for m in range(M):
            on = mid == jnp.float32(m)
            c0 = jnp.where(on, P(15 + 3 * m + 0), c0)
            c1 = jnp.where(on, P(15 + 3 * m + 1), c1)
            c2 = jnp.where(on, P(15 + 3 * m + 2), c2)
            row = jnp.where(on, jnp.float32(float(const_rows[m])), row)

        sel = mid == jnp.float32(dyn_mi)
        em0_ref[...] = jnp.where(sel, d0, c0)
        em1_ref[...] = jnp.where(sel, d1, c1)
        em2_ref[...] = jnp.where(sel, d2, c2)
        tx0_ref[...] = t0
        tx1_ref[...] = t1
        tx2_ref[...] = t2
        xi_ref[...] = xc
        yi_ref[...] = yc
        fl_ref[...] = (jnp.where(sel, 1.0, 0.0)
                       + jnp.where(inb, 2.0, 0.0))
        row_ref[...] = row

    interpret = jax.default_backend() != "tpu"
    kern = functools.partial(kernel, H=IMG_H, W=IMG_W, W_pad=W_PAD, KX=KX)

    def run_kernel(packed, img_r, *arrs):
        n = arrs[0].shape[0]
        shape2 = (n // 128, 128)
        grid = n // _LANES
        block = pl.BlockSpec((_T_ROWS, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        img_spec = pl.BlockSpec(img_r.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, P_total), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM), img_spec]
                     + [block] * len(arrs),
            out_specs=[block] * 10,
            out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 10,
            interpret=interpret,
        )(packed[None, :], img_r, *(a.reshape(shape2) for a in arrs))
        return [o.reshape(n) for o in outs]

    def _pack(params):
        sg = jax.lax.stop_gradient
        if xform_idx is not None:
            xf = sg(params["tex_xform"][xform_idx]).reshape(12)
        else:
            xf = jnp.zeros(12, jnp.float32)
        if factor_idx is not None:
            fc = sg(params["factor"][factor_idx])
        else:
            fc = jnp.ones(3, jnp.float32)
        ce = sg(params["const"][jnp.asarray(const_rows)]).reshape(-1)
        return jnp.concatenate([xf, fc, ce])

    def _img_r(img):
        # j = c·W_PAD + x (rgb only — alpha is never read), hi/lo bf16
        # split stacked along rows (kernel comment).
        #
        # The split MUST go through lax.reduce_precision: with this
        # toolchain's --xla_allow_excess_precision=true, the naive
        # ``r - f32(r.astype(bf16))`` is algebraically simplified to ZERO
        # (the round-trip is treated as identity), silently shipping
        # hi-only — every sky texel bf16-rounded on hardware, caught by
        # tools/tpu_golden.py's depth-0 gate in round 3.  Interpret mode
        # (CPU tests) does not simplify, which is why the kernel's own
        # unit tests stayed green.  reduce_precision computes the bf16
        # VALUE in f32 and is not foldable.
        r = jnp.zeros((H_PAD, 3 * W_PAD), jnp.float32)
        r = r.at[:IMG_H, :].set(
            jnp.pad(img[..., :3].transpose(0, 2, 1),
                    ((0, 0), (0, 0), (0, W_PAD - IMG_W))
                    ).reshape(IMG_H, 3 * W_PAD))
        hi_f32 = jax.lax.reduce_precision(r, exponent_bits=8,
                                          mantissa_bits=7)
        hi = hi_f32.astype(jnp.bfloat16)          # exact: already on grid
        lo = (r - hi_f32).astype(jnp.bfloat16)
        return jax.lax.stop_gradient(jnp.concatenate([hi, lo], axis=0))

    def _forward(params, pos, mid):
        N = pos.shape[0]
        pad = (-N) % _LANES

        def col(a, fill=0.0):
            if pad:
                return jnp.concatenate(
                    [a, jnp.full((pad,), fill, a.dtype)])
            return a
        sg = jax.lax.stop_gradient
        arrs = [col(sg(pos[:, i])) for i in range(3)]
        arrs.append(col(mid.astype(jnp.float32)))
        if img_id is not None:
            img_r = _img_r(sg(params["images"][img_id]))
        else:
            img_r = jnp.zeros((2 * H_PAD, 3 * W_PAD), jnp.bfloat16)
        outs = run_kernel(_pack(params), img_r, *arrs)
        cut = lambda a: a[:N]
        em = jnp.stack([cut(outs[0]), cut(outs[1]), cut(outs[2])], -1)
        texel = jnp.stack([cut(outs[3]), cut(outs[4]), cut(outs[5])], -1)
        xi, yi, fl = cut(outs[6]), cut(outs[7]), cut(outs[8])
        row = cut(outs[9])
        return em, (texel, xi, yi, fl, row)

    @jax.custom_vjp
    def em_fn(params, pos, mid):
        return _forward(params, pos, mid)[0]

    def fwd2(params, pos, mid):
        em, res = _forward(params, pos, mid)
        fval = (params["factor"][factor_idx] if factor_idx is not None
                else jnp.ones(3, jnp.float32))
        return em, (res, fval, params)

    def bwd2(resids, ct):
        # ONE combined histogram accumulates the image cotangent (bins
        # [0, H)×[0, W)) AND the const-table row cotangents (bins
        # [H, H+R) at x=0) — the two hist kernel launches measured
        # ~0.9 ms/step as separate calls.  Image bins take ct·factor on
        # dyn in-bounds lanes; const bins take raw ct on non-dyn lanes
        # (the kernel exported each lane's static const row id).
        (texel, xi, yi, fl, row), fval, params = resids
        sel = (fl % 2.0) >= 1.0
        inb = fl >= 2.0
        d_params = jax.tree.map(jnp.zeros_like, params)

        ct_dyn = jnp.where(sel[..., None], ct, 0.0)
        R = params["const"].shape[0]
        hist = _build_hist(IMG_H + R, IMG_W, 3, interpret=interpret)
        y = jnp.where(sel & inb, yi,
                      jnp.where(sel, -1.0, jnp.float32(IMG_H) + row))
        x = jnp.where(sel, xi, 0.0)
        vals = jnp.where(sel[..., None], ct_dyn * fval, ct)
        n = y.shape[0]
        pad = (-n) % _LANES
        if pad:
            y = jnp.concatenate([y, jnp.full((pad,), -1.0)])
            x = jnp.concatenate([x, jnp.zeros((pad,))])
            vals = jnp.concatenate([vals, jnp.zeros((pad, 3))])
        out = hist(y, x, vals)                            # (H+R, W, 3)
        if img_id is not None:
            d_img = jnp.concatenate(
                [out[:IMG_H], jnp.zeros((IMG_H, IMG_W, 1), jnp.float32)],
                axis=-1)
            imgs = list(d_params["images"])
            imgs[img_id] = d_img
            d_params = dict(d_params, images=imgs)
        d_params = dict(d_params,
                        const=d_params["const"] + out[IMG_H:, 0, :])
        if factor_idx is not None:
            d_f = jnp.sum(ct_dyn * texel, axis=0)         # (3,)
            d_params = dict(
                d_params,
                factor=d_params["factor"].at[factor_idx].add(d_f))
        return (d_params, jnp.zeros(texel.shape[:1] + (3,), jnp.float32),
                None)

    em_fn.defvjp(fwd2, bwd2)
    return em_fn
