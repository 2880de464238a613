"""Pallas TPU megakernel for CSG first-hit.

Fuses the whole sort-free first-hit evaluation (ptx.geom.fasthit) into one
kernel: per 8×128 ray tile, every leaf interval, all 2L·L·2 membership
compares, the boolean tape folds, the running argmin, and the payload
(normal/material/parity) resolution run entirely in registers/VMEM — no
intermediate (2L, L, B) tensors ever touch HBM.  The CSG structure is
unrolled at kernel-build time (scenes are compiled once), so the kernel is
straight-line vector code.

Scene parameters arrive as one packed f32 vector in SMEM (layout fixed at
compile time); transforms are pre-composed/inverted *outside* the kernel
in differentiable jnp.

Gradients: a ``jax.custom_vjp`` wraps the kernel.  The backward pass
recomputes the differentiable quantities (boundary ``t``, normal) for the
*selected* leaf only, in plain jnp, and routes the cotangents through
that recompute — mathematically identical to the jnp path's gradients
(selection indices are constants in both).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptx.core import linalg
from ptx.core.constants import EPS, MAX_VALUE
from ptx.geom import hitreplay, tape

_PAD_T = 3e20
# 32×128 ray tiles measured fastest (amortizes per-tile setup; VMEM live
# set ~2.6 MB stays well under budget)
_TILE_ROWS = 32
_TILE = _TILE_ROWS * 128


def _collect_leaves(plan):
    # depth-descending order = the coincident-boundary tie-break (see
    # ptx.geom.fasthit.collect_leaves); the kernel's strict `<` running
    # argmin keeps the first-processed candidate on ties
    from ptx.geom.fasthit import collect_leaves
    return collect_leaves(plan)


def _pack_params(leaves, params):
    """Differentiable jnp packing of per-leaf scalars (layout is static).

    sphere: cx cy cz r                                (4)
    plane:  nx ny nz d inv_mag                        (5)
    transformed leaves append: W_inv (3x4 row-major) + A^{-T} (3x3)  (21)
    """
    chunks = []
    offsets = []
    for lf, _p in leaves:
        offsets.append(sum(c.shape[0] for c in chunks))
        if lf.kind == "sphere":
            c = params["sphere_center"][lf.index]
            r = params["sphere_radius"][lf.index]
            chunks.append(jnp.concatenate([c, r[None]]))
        else:
            n = params["plane_normal"][lf.index]
            d = params["plane_d"][lf.index]
            inv_mag = 1.0 / jnp.sqrt(jnp.maximum(jnp.sum(n * n), 1e-30))
            chunks.append(jnp.concatenate([n, d[None], inv_mag[None]]))
        if lf.xform_chain:
            w = params["xform"][lf.xform_chain[0]]
            for i in lf.xform_chain[1:]:
                w = linalg.compose(w, params["xform"][i])
            w_inv = linalg.inverse(w)
            nrm = jnp.transpose(w_inv[:, :3])
            chunks.append(jnp.concatenate([w_inv.reshape(-1),
                                           nrm.reshape(-1)]))
    return jnp.concatenate(chunks), offsets


def _leaf_interval_exprs(lf, P, off, ox, oy, oz, dx, dy, dz):
    """Shared (pallas/jnp) straight-line interval math for one leaf.

    ``P`` indexes packed params (callable idx -> scalar).  Returns
    (t0, t1, normal_fn) where normal_fn(t, is_start) -> (nx, ny, nz).
    """
    base = off
    if lf.xform_chain:
        xoff = base + (4 if lf.kind == "sphere" else 5)
        w = [P(xoff + i) for i in range(12)]
        nrm = [P(xoff + 12 + i) for i in range(9)]
        lox = w[0] * ox + w[1] * oy + w[2] * oz + w[3]
        loy = w[4] * ox + w[5] * oy + w[6] * oz + w[7]
        loz = w[8] * ox + w[9] * oy + w[10] * oz + w[11]
        ldx = w[0] * dx + w[1] * dy + w[2] * dz
        ldy = w[4] * dx + w[5] * dy + w[6] * dz
        ldz = w[8] * dx + w[9] * dy + w[10] * dz
    else:
        nrm = None
        lox, loy, loz, ldx, ldy, ldz = ox, oy, oz, dx, dy, dz

    def push_normal(nx, ny, nz):
        if nrm is None:
            return nx, ny, nz
        wx = nrm[0] * nx + nrm[1] * ny + nrm[2] * nz
        wy = nrm[3] * nx + nrm[4] * ny + nrm[5] * nz
        wz = nrm[6] * nx + nrm[7] * ny + nrm[8] * nz
        mag = jnp.sqrt(wx * wx + wy * wy + wz * wz)
        inv = 1.0 / jnp.where(mag == 0.0, 1.0, mag)
        return wx * inv, wy * inv, wz * inv

    if lf.kind == "sphere":
        cx, cy, cz, r = P(base), P(base + 1), P(base + 2), P(base + 3)
        ocx, ocy, ocz = lox - cx, loy - cy, loz - cz
        a = ldx * ldx + ldy * ldy + ldz * ldz
        b = ocx * ldx + ocy * ldy + ocz * ldz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - a * cc
        ok = (disc > EPS) & (a != 0.0)
        sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
        sa = jnp.where(a == 0.0, 1.0, a)
        t0v = (-b - sq) / sa
        t1v = (-b + sq) / sa
        t0 = jnp.where(ok, t0v, _PAD_T)
        t1 = jnp.where(ok, t1v, _PAD_T)

        def normal_fn(t, _is_start):
            inv_r = 1.0 / jnp.where(r == 0.0, 1.0, r)
            return push_normal((ocx + t * ldx) * inv_r,
                               (ocy + t * ldy) * inv_r,
                               (ocz + t * ldz) * inv_r)
        return t0, t1, normal_fn

    nx, ny, nz, d, inv_mag = (P(base), P(base + 1), P(base + 2),
                              P(base + 3), P(base + 4))
    divisor = ldx * nx + ldy * ny + ldz * nz
    numer = -d - (lox * nx + loy * ny + loz * nz)
    safe_div = jnp.where(jnp.abs(divisor) < EPS * EPS, 1.0, divisor)
    t = numer / safe_div
    degenerate = (jnp.abs(divisor) < EPS * EPS) | (jnp.abs(t) >= MAX_VALUE)
    on_boundary = jnp.abs(numer) < EPS * EPS
    entering_half = divisor < 0.0
    full = degenerate & on_boundary
    miss = degenerate & ~on_boundary
    t0v = jnp.where(full, -MAX_VALUE, jnp.where(entering_half, t, -MAX_VALUE))
    t1v = jnp.where(full, MAX_VALUE, jnp.where(entering_half, MAX_VALUE, t))
    t0 = jnp.where(miss, _PAD_T, t0v)
    t1 = jnp.where(miss, _PAD_T, t1v)

    def normal_fn(t_, _is_start):
        one = jnp.ones_like(t_)
        return push_normal(nx * inv_mag * one, ny * inv_mag * one,
                           nz * inv_mag * one)
    return t0, t1, normal_fn


def _fold_tape(plan, leaf_pos, bits):
    if isinstance(plan, tape._LeafPlan):
        return bits[leaf_pos[id(plan)]]
    kids = [_fold_tape(c, leaf_pos, bits) for c in plan.children]
    if plan.op == "union":
        out = kids[0]
        for k in kids[1:]:
            out = out | k
        return out
    if plan.op == "intersection":
        out = kids[0]
        for k in kids[1:]:
            out = out & k
        return out
    return kids[0] & ~kids[1]


def hit_fold(plan, leaves, offsets, leaf_pos, parity_np, P,
             ox, oy, oz, dx, dy, dz):
    """The in-kernel first-hit fold, shared by the hit megakernel and the
    fused bounce kernel (ptx.ops.bounce_kernel).

    Returns ``(best_t, best_i, best_after_f, hit, nx, ny, nz)`` — signed
    normals, all-f32 carry (see the Mosaic bool-select note below).
    ``best_t`` is UNGATED (``_PAD_T`` on miss); callers gate ``t`` with
    ``hit`` themselves.
    """
    t0s, t1s, normal_fns = [], [], []
    for (lf, _p), off in zip(leaves, offsets):
        t0, t1, nfn = _leaf_interval_exprs(lf, P, off,
                                           ox, oy, oz, dx, dy, dz)
        t0s.append(t0)
        t1s.append(t1)
        normal_fns.append(nfn)
    L = len(leaves)

    # all-f32 register state: Mosaic (this toolchain) rejects
    # select-of-bool chains ("unsupported bitwidth for truncation"),
    # so the entering flag is carried as 0.0/1.0
    best_t = jnp.full(ox.shape, _PAD_T, jnp.float32)
    best_i = jnp.zeros(ox.shape, jnp.float32)        # event index as f32
    best_after_f = jnp.zeros(ox.shape, jnp.float32)
    any_c = jnp.zeros(ox.shape, bool)
    for i in range(2 * L):
        ti = t0s[i % L] if i < L else t1s[i % L]
        after_bits = [(t0s[k] <= ti) & (ti < t1s[k]) for k in range(L)]
        before_bits = [(t0s[k] < ti) & (ti <= t1s[k]) for k in range(L)]
        after = _fold_tape(plan, leaf_pos, after_bits)
        before = _fold_tape(plan, leaf_pos, before_bits)
        cand = (after != before) & (ti >= EPS)
        better = cand & (ti < best_t)
        best_t = jnp.where(better, ti, best_t)
        best_i = jnp.where(better, jnp.float32(i), best_i)
        best_after_f = jnp.where(better, jnp.where(after, 1.0, 0.0),
                                 best_after_f)
        any_c = any_c | cand

    best_after = best_after_f > 0.5
    escaped = best_t >= MAX_VALUE
    hit = any_c & ~escaped
    leaf_idx = jnp.where(best_i >= L, best_i - L, best_i)

    nx = jnp.zeros(ox.shape, jnp.float32)
    ny = jnp.zeros(ox.shape, jnp.float32)
    nz = jnp.zeros(ox.shape, jnp.float32)
    par = jnp.zeros(ox.shape, jnp.float32)
    for k in range(L):
        sel = leaf_idx == jnp.float32(k)
        kx, ky, kz = normal_fns[k](best_t, None)
        nx = jnp.where(sel, kx, nx)
        ny = jnp.where(sel, ky, ny)
        nz = jnp.where(sel, kz, nz)
        par = jnp.where(sel, jnp.float32(parity_np[k]), par)
    sign = par * jnp.where(best_after, 1.0, -1.0)
    return best_t, best_i, best_after_f, hit, nx * sign, ny * sign, nz * sign


def build_hit_kernel(plan):
    """Returns ``hit_fn(params, origin, direction)`` backed by the Pallas
    kernel with a custom VJP."""
    leaves = _collect_leaves(plan)
    L = len(leaves)
    leaf_pos = {id(lf): i for i, (lf, _) in enumerate(leaves)}
    parity_np = np.array([p for _, p in leaves], np.float32)
    mats_np = np.array([lf.mat_id for lf, _ in leaves], np.int32)

    # static packed-params layout
    probe = {
        "sphere_center": jnp.zeros((max((lf.index for lf, _ in leaves
                                        if lf.kind == "sphere"),
                                        default=-1) + 1, 3)),
        "sphere_radius": jnp.zeros((max((lf.index for lf, _ in leaves
                                        if lf.kind == "sphere"),
                                        default=-1) + 1,)),
        "plane_normal": jnp.ones((max((lf.index for lf, _ in leaves
                                      if lf.kind == "plane"),
                                      default=-1) + 1, 3)),
        "plane_d": jnp.zeros((max((lf.index for lf, _ in leaves
                                  if lf.kind == "plane"),
                                  default=-1) + 1,)),
        "xform": jnp.tile(jnp.eye(3, 4)[None],
                          (max((max(lf.xform_chain) for lf, _ in leaves
                               if lf.xform_chain), default=-1) + 1, 1, 1)),
    }
    _, offsets = _pack_params(leaves, probe)

    def kernel(pp_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               t_ref, nx_ref, ny_ref, nz_ref, flags_ref, leaf_ref):
        P = lambda i: pp_ref[0, i]
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
        dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]

        best_t, best_i, best_after_f, hit, nx, ny, nz = hit_fold(
            plan, leaves, offsets, leaf_pos, parity_np, P,
            ox, oy, oz, dx, dy, dz)

        t_ref[...] = jnp.where(hit, best_t, 0.0)
        nx_ref[...] = nx
        ny_ref[...] = ny
        nz_ref[...] = nz
        # flags = hit + 2·entering; evt = float(best event index)
        flags_ref[...] = (jnp.where(hit, 1.0, 0.0)
                          + jnp.where(best_after_f > 0.5, 2.0, 0.0))
        leaf_ref[...] = jnp.where(hit, best_i, 0.0)

    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def run_kernel(packed, ox, oy, oz, dx, dy, dz):
        n = ox.shape[0]
        rows = n // 128
        shape2 = (rows, 128)
        as2 = lambda a: a.reshape(shape2)
        grid = rows // _TILE_ROWS
        block = pl.BlockSpec((_TILE_ROWS, 128),
                             lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((1, packed.shape[0]),
                                   lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)] + [block] * 6,
            out_specs=[block] * 6,
            out_shape=[
                jax.ShapeDtypeStruct(shape2, jnp.float32),   # t
                jax.ShapeDtypeStruct(shape2, jnp.float32),   # nx
                jax.ShapeDtypeStruct(shape2, jnp.float32),   # ny
                jax.ShapeDtypeStruct(shape2, jnp.float32),   # nz
                jax.ShapeDtypeStruct(shape2, jnp.float32),   # flags
                jax.ShapeDtypeStruct(shape2, jnp.float32),   # event idx
            ],
            interpret=interpret,
        )(packed[None, :], as2(ox), as2(oy), as2(oz),
          as2(dx), as2(dy), as2(dz))
        return [o.reshape(n) for o in outs]

    # ---- differentiable selected-leaf recompute (for the VJP) ----------
    # shared with the full-bounce manual VJP: ptx.geom.hitreplay
    replay = hitreplay.build_hit_replay(leaves, parity_np)

    @jax.custom_vjp
    def hit_core(params, origin, direction):
        batch_shape = origin.shape[:-1]
        n = int(np.prod(batch_shape)) if batch_shape else 1
        pad = (-n) % _TILE
        flat = lambda a: jnp.concatenate(
            [a.reshape(-1), jnp.zeros((pad,), a.dtype)]) if pad else a.reshape(-1)
        ox, oy, oz = (flat(origin[..., i]) for i in range(3))
        dx, dy, dz = (flat(direction[..., i]) for i in range(3))
        # make padded dirs non-degenerate
        if pad:
            dz = dz.at[n:].set(-1.0)
        packed, _ = _pack_params(leaves, params)
        t, nx, ny, nz, flags, evt = run_kernel(packed, ox, oy, oz,
                                               dx, dy, dz)
        cut = lambda a: a[:n].reshape(batch_shape)
        flags_i = cut(flags).astype(jnp.int32)
        hit_i = flags_i & 1
        entering_i = (flags_i >> 1) & 1
        evt_c = cut(evt).astype(jnp.int32)
        leaf_c = jnp.where(evt_c >= L, evt_c - L, evt_c)
        return {
            "t": cut(t),
            "normal": jnp.stack([cut(nx), cut(ny), cut(nz)], axis=-1),
            "mat_id": jnp.asarray(mats_np)[leaf_c] * hit_i,
            "entering": entering_i.astype(bool),
            "hit": hit_i.astype(bool),
            "_evt": evt_c,
        }

    def hit_fwd(params, origin, direction):
        out = hit_core(params, origin, direction)
        return out, (params, origin, direction, out)

    def hit_bwd(res, ct):
        params, origin, direction, out = res
        # gradient flows through t and normal of the selected boundary
        def diff_part(params, origin, direction):
            return replay(params, origin, direction, out["_evt"],
                          out["entering"], out["hit"])

        _, vjp = jax.vjp(diff_part, params, origin, direction)
        dparams, dorigin, ddirection = vjp((ct["t"], ct["normal"]))
        return dparams, dorigin, ddirection

    hit_core.defvjp(hit_fwd, hit_bwd)

    def hit_fn(params, origin, direction):
        out = hit_core(params, origin, direction)
        return out

    return hit_fn
