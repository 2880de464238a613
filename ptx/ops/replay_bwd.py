"""Row-fed decision-frozen replay backward kernel (any leaf count).

The manual full-bounce custom VJP (trace._make_manual_bounce) replays
each bounce differentiably in the backward pass.  For flagship scenes
(L ≤ 24) that replay is already a Pallas kernel whose per-leaf rows ride
SMEM-unrolled selects (ptx.ops.bounce_kernel.build_bounce_bwd_kernel) —
an O(L)-unroll that cannot scale to the megasweep's L ≈ 256+.  The XLA
replay it falls back to at scale measured 4.3 of ~10 ms/step at L=256
(tools/mega_prof.py, round 4): one packed row gather, then an
elementwise jvp+transpose soup whose d_row assembly alone (slice
transposes + add_any) cost ~1.3 ms/step.

This kernel is L-independent: the winner's packed parameter row is
SELECTED IN XLA (one (B, 36) gather — leaf row 26 + is_sphere/parity +
8 material scalars, material keyed statically per leaf so the whole
fetch is one row) and fed to the kernel as a (B/128, 40, 128) VMEM
block; the kernel runs ``jax.vjp`` over the shared per-lane replay math
(bounce_kernel.replay_lane_math — trace-time autodiff, no hand
adjoints).  The (B, 36) → (L, 36) cotangent contraction happens
IN-KERNEL on the MXU (per-sublane one-hot dots into a sequential-grid
(L_pad, 128) accumulator — the flagship bounce_bwd pattern), so the
per-lane cotangent rows never touch HBM and no (B, L) one-hot is ever
materialized; the params transpose reuses ``jax.vjp`` of the packing
function on the tiny (L, 36) result.

Reference parity: the replay math mirrors the reference integrator's
bounce equations (/root/reference/src/path-trace.h:105-170) exactly as
trace._bounce_replay does; this module only changes WHERE the backward
evaluates, never what it computes — gated by
tests/test_replay_bwd.py's digest match against the XLA replay VJP.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RCOLS = 36          # 26 leaf row | sph parity | 8 material scalars
_RPAD = 40           # sublane-aligned column count (pad mult of 8)
_BLK = 32            # sublane rows per grid step (32·128 = 4096 lanes)
_TILE = _BLK * 128


def build_replay_bwd(leaves, material_meta, mats_np):
    """Returns ``bwd_fn(params, o, d, thr, dec, ct_o2, ct_d2, ct_thr2)``
    → ``(d_o, d_d, d_thr, d_params)`` — the exact contract of
    bounce_kernel.build_bounce_bwd_kernel, valid at any leaf count."""
    from ptx.geom import hitreplay
    from ptx.ops.bounce_kernel import replay_lane_math

    L = len(leaves)
    parity_np = np.array([p for _, p in leaves], np.float32)
    is_sphere_np = np.array(
        [lf.kind == "sphere" for lf, _ in leaves], np.float32)
    aux_np = np.stack([is_sphere_np, parity_np], axis=1)       # (L, 2)
    const_idx, n_materials = material_meta
    leaf_mat = np.asarray(mats_np, np.int32)

    def pack36(params):
        rows = hitreplay.leaf_rows(leaves, params)             # (L, 26)
        const = params["const"]
        rfl = const[const_idx["reflect"]]
        sc = jnp.mean(const[const_idx["scatter"]], axis=-1)
        tr = const[const_idx["transmit"]]
        ior = params["ior"]
        mat = jnp.concatenate([rfl, sc[:, None], tr, ior[:, None]],
                              axis=-1)                         # (M, 8)
        return jnp.concatenate(
            [rows, jnp.asarray(aux_np), mat[jnp.asarray(leaf_mat)]],
            axis=1)                                            # (L, 36)

    _LPAD = max(8, -(-L // 8) * 8)

    def kernel(row_ref, evt_ref, fl_ref, ux_ref, uy_ref, uz_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tx_ref, ty_ref, tz_ref,
               co_x_ref, co_y_ref, co_z_ref,
               cd_x_ref, cd_y_ref, cd_z_ref,
               ct_x_ref, ct_y_ref, ct_z_ref,
               do_x_ref, do_y_ref, do_z_ref,
               dd_x_ref, dd_y_ref, dd_z_ref,
               dt_x_ref, dt_y_ref, dt_z_ref, dacc_ref):
        evt = evt_ref[...]
        fl = fl_ref[...]
        # flag encoding identical to bounce_kernel's bwd_fn
        hit = (fl % 2.0) >= 1.0
        entering = (fl % 4.0) >= 2.0
        take_transmit = (fl % 8.0) >= 4.0
        scatter_alive = (fl % 16.0) >= 8.0
        is_start = evt < jnp.float32(L)
        u_sel = (ux_ref[...], uy_ref[...], uz_ref[...])
        o = (ox_ref[...], oy_ref[...], oz_ref[...])
        d = (dx_ref[...], dy_ref[...], dz_ref[...])
        thr = (tx_ref[...], ty_ref[...], tz_ref[...])
        cts = (co_x_ref[...], co_y_ref[...], co_z_ref[...],
               cd_x_ref[...], cd_y_ref[...], cd_z_ref[...],
               ct_x_ref[...], ct_y_ref[...], ct_z_ref[...])
        rowblk = row_ref[...]                        # (_BLK, _RPAD, 128)

        def f3(rowblk, ox, oy, oz, dx_, dy_, dz_, thx, thy, thz):
            row = tuple(rowblk[:, j, :] for j in range(26))
            sph = rowblk[:, 26, :] > 0.5
            par = rowblk[:, 27, :]
            ms = tuple(rowblk[:, 28 + j, :] for j in range(8))
            return replay_lane_math(
                row, sph, par, ms, (ox, oy, oz), (dx_, dy_, dz_),
                (thx, thy, thz), is_start=is_start, hit=hit,
                entering=entering, take_transmit=take_transmit,
                scatter_alive=scatter_alive, u_sel=u_sel)

        _, vjp = jax.vjp(f3, rowblk, *o, *d, *thr)
        (d_row, d_ox, d_oy, d_oz, d_dx, d_dy, d_dz,
         d_tx, d_ty, d_tz) = vjp(cts)
        do_x_ref[...] = d_ox
        do_y_ref[...] = d_oy
        do_z_ref[...] = d_oz
        dd_x_ref[...] = d_dx
        dd_y_ref[...] = d_dy
        dd_z_ref[...] = d_dz
        dt_x_ref[...] = d_tx
        dt_y_ref[...] = d_ty
        dt_z_ref[...] = d_tz
        # contract per-lane cotangent rows into per-LEAF rows on the MXU
        # IN-KERNEL (flagship bounce_bwd pattern: per-sublane one-hot
        # dots into a sequential-grid accumulator) — this kills the XLA
        # one-hot materialization (67 MB/bounce at B=65k, L=256), the
        # d_row layout transpose, and the d_row HBM round trip.
        leaf_f = jnp.where(evt >= jnp.float32(L),
                           evt - jnp.float32(L), evt)       # (_BLK, 128)
        iota_l = jax.lax.broadcasted_iota(
            jnp.int32, (_LPAD, 128), 0).astype(jnp.float32)
        acc = jnp.zeros((_LPAD, 128), jnp.float32)
        for s in range(_BLK):
            oh = jnp.where(
                iota_l == jnp.broadcast_to(leaf_f[s:s + 1, :],
                                           (_LPAD, 128)), 1.0, 0.0)
            wv = d_row[s, :, :]                              # (_RPAD, 128)
            part = jax.lax.dot_general(
                oh, wv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)         # (_LPAD, 40)
            acc = acc + jnp.concatenate(
                [part, jnp.zeros((_LPAD, 128 - _RPAD), jnp.float32)],
                axis=1)
        first = pl.program_id(0) == 0
        prev = jnp.where(first, jnp.zeros_like(acc), dacc_ref[...])
        dacc_ref[...] = prev + acc

    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def run_kernel(rowblk, *arrs):
        n = arrs[0].shape[0]
        rows = n // 128
        shape2 = (rows, 128)
        grid = rows // _BLK
        block = pl.BlockSpec((_BLK, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        rblock = pl.BlockSpec((_BLK, _RPAD, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[rblock] + [block] * len(arrs),
            out_specs=[block] * 9
                      + [pl.BlockSpec((_LPAD, 128), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32)] * 9
                      + [jax.ShapeDtypeStruct((_LPAD, 128), jnp.float32)],
            interpret=interpret,
        )(rowblk, *(a.reshape(shape2) for a in arrs))
        return [o.reshape(n) for o in outs[:9]], outs[9]

    def bwd_fn(params, o, d, thr, dec, ct_o2, ct_d2, ct_thr2):
        B = o.shape[0]
        pad = (-B) % _TILE
        Bp = B + pad

        def col(a):
            a = a.astype(jnp.float32)
            if pad:
                return jnp.concatenate([a, jnp.zeros((pad,), jnp.float32)])
            return a

        evt = dec["evt"].astype(jnp.int32)
        leaf_idx = jnp.where(evt >= L, evt - L, evt)
        # pad BEFORE the gather: padded lanes must carry leaf 0's REAL
        # row (like real miss lanes, whose zero cotangents are proven
        # NaN-free) — an all-zero pad row has ior = 0, whose unselected
        # 1/ior branch is inf and 0·inf = NaN in the VJP; the in-kernel
        # MXU contraction sums over ALL lanes, so one NaN lane would
        # poison every leaf row (the old XLA contraction cut pads first)
        if pad:
            leaf_idx = jnp.concatenate(
                [leaf_idx, jnp.zeros((pad,), jnp.int32)])

        packed, pack_vjp = jax.vjp(pack36, params)
        g = jax.lax.stop_gradient(packed)[leaf_idx]            # (Bp, 36)
        g = jnp.concatenate(
            [g, jnp.zeros((Bp, _RPAD - _RCOLS), jnp.float32)], axis=1)
        rowblk = g.reshape(Bp // 128, 128, _RPAD).transpose(0, 2, 1)

        flags = (dec["hit"].astype(jnp.float32)
                 + 2.0 * dec["entering"].astype(jnp.float32)
                 + 4.0 * dec["take_transmit"].astype(jnp.float32)
                 + 8.0 * dec["scatter_alive"].astype(jnp.float32))
        comps = [col(evt.astype(jnp.float32)), col(flags)]
        comps += [col(dec["u_sel"][:, i]) for i in range(3)]
        for arr in (o, d, thr, ct_o2, ct_d2, ct_thr2):
            comps += [col(arr[:, i]) for i in range(3)]

        lanes, dacc = run_kernel(rowblk, *comps)
        cut = lambda a: a[:B]
        d_o = jnp.stack([cut(lanes[0]), cut(lanes[1]), cut(lanes[2])], -1)
        d_d = jnp.stack([cut(lanes[3]), cut(lanes[4]), cut(lanes[5])], -1)
        d_thr = jnp.stack([cut(lanes[6]), cut(lanes[7]), cut(lanes[8])],
                          -1)
        (d_params,) = pack_vjp(dacc[:L, :_RCOLS])
        return d_o, d_d, d_thr, d_params

    return bwd_fn
