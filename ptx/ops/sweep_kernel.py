"""Pallas column-parallel sort + sweep-select kernel for the union-sweep
first hit (ptx.geom.fasthit._compile_union_sweep).

The jnp sweep pays three separate big-tensor stages after interval
construction (tools/sweep_breakdown.py at L=256, B=65k, round 3):
``lax.sort`` ≈ 3.1 ms, the prefix-max ``associative_scan`` + break/min
candidate reduces + winner-payload equality match ≈ 2.5 ms — every pass
round-tripping (L, B) ≈ 67 MB through HBM.

This kernel does ALL of it in one launch, one HBM read of each operand:
for a (L_pad, bw) column block resident in VMEM it

1. sorts the (s, e) interval pairs by ``s`` with a **bitonic network
   over the row dimension** — log²L compare-exchange passes built from
   static row shifts, all in VMEM (sortedness is column-local, so the
   network vectorizes perfectly across the 128-lane axis);
2. computes the exclusive prefix max of ``e`` by log-doubling shifts;
3. evaluates the break mask and the te/tx candidate minima;
4. recovers the min-leaf payload by equality match against the unsorted
   ``t0``/``t1`` blocks,

emitting one packed (8, bw) row block:

  row 0  t_star      row 1  entering (0/1)
  row 2  m_start     row 3  m_end          (f32 leaf ids, exact ≤ 2^24)
  row 4  found (0/1) rows 5-7 zero

Semantics are exact vs the jnp path: the bitonic sort is unstable, but
the sweep's outputs are tie-order independent — equal starts sort
adjacent, only the first can break, and its prior-chain max excludes
every equal-start peer either way (tests/test_large_scenes.py
cross-checks ``_evt``-exact agreement on tie-heavy scenes).

Mosaic notes: all register state is f32 (CLAUDE.md: narrow-int vectors
and bool select chains are rejected by this toolchain); bitonic
index-bit tests are f32 floor/mod arithmetic (exact for row ids < 2²⁴).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD_T = np.float32(3e20)
_NEG = np.float32(-3e20)
_BW = 512                       # column block width (lanes)


def _shift_up(a, d, fill):
    """a[i] ← a[i+d] (rows move up); vacated tail rows get fill."""
    Lp, bw = a.shape
    pad = jnp.full((d, bw), fill, jnp.float32)
    return jnp.concatenate([a[d:], pad], axis=0)


def _shift_down(a, d, fill):
    """a[i] ← a[i−d]; vacated head rows get fill."""
    Lp, bw = a.shape
    pad = jnp.full((d, bw), fill, jnp.float32)
    return jnp.concatenate([pad, a[:Lp - d]], axis=0)


def _bitonic_by_s(s, e, Lp):
    """Sort (s, e) pairs by s ascending along axis 0 (Lp a power of 2).

    Compare-exchange partners are i ^ stride — realized as a select
    between the two static row shifts; index-bit tests are f32
    floor/mod (rows < 2²⁴ ⇒ exact)."""
    bw = s.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (Lp, bw), 0).astype(
        jnp.float32)

    # masks stay f32 0/1 throughout: Mosaic on this toolchain rejects
    # where(bool, bool, bool) select chains ("Unsupported target
    # bitwidth for truncation") — CLAUDE.md / ptx.ops.fasthit_kernel
    def bit_clear_f(v, b):
        return jnp.where(jnp.floor(v / float(b)) % 2.0 < 0.5, 1.0, 0.0)

    size = 2
    while size <= Lp:
        stride = size // 2
        while stride >= 1:
            lo_f = bit_clear_f(row, stride)
            asc_f = bit_clear_f(row, size)
            lo_is_me = lo_f > 0.5
            # partner rows: i^stride = i+stride (bit clear) else i−stride
            up_s = _shift_up(s, stride, _PAD_T)
            dn_s = _shift_down(s, stride, _PAD_T)
            up_e = _shift_up(e, stride, _NEG)
            dn_e = _shift_down(e, stride, _NEG)
            ps = jnp.where(lo_is_me, up_s, dn_s)
            pe = jnp.where(lo_is_me, up_e, dn_e)
            # want_min = (lo_is_me == asc); strict compares keep (s, e)
            # pairs a permutation under ties
            take_f = jnp.where(
                lo_f == asc_f,
                jnp.where(ps < s, 1.0, 0.0),
                jnp.where(ps > s, 1.0, 0.0))
            take = take_f > 0.5
            s = jnp.where(take, ps, s)
            e = jnp.where(take, pe, e)
            stride //= 2
        size *= 2
    return s, e


def _kernel(s_ref, e_ref, t0_ref, t1_ref, out_ref, *, Lp, L_true, eps,
            do_sort):
    s = s_ref[...]                                  # (Lp, bw) starts
    e = e_ref[...]                                  # (Lp, bw) ends
    bw = s.shape[1]

    if do_sort:
        s, e = _bitonic_by_s(s, e, Lp)

    # exclusive prefix max of e over rows, by log-doubling VMEM shifts:
    # p[k] = max(e[0..k-1])
    p = _shift_down(e, 1, _NEG)
    dly = 1
    while dly < Lp:
        p = jnp.maximum(p, _shift_down(p, dly, _NEG))
        dly *= 2

    is_break = (s < 2e20) & (s > p)
    te = jnp.min(jnp.where(is_break & (s >= eps), s, _PAD_T), axis=0)
    tx = jnp.min(jnp.where(is_break & (p >= eps), p, _PAD_T), axis=0)
    inc_last = jnp.max(e, axis=0)                   # (bw,)
    tx = jnp.minimum(tx, jnp.where(inc_last >= eps, inc_last, _PAD_T))

    entering = te <= tx
    t_star = jnp.minimum(te, tx)
    found = t_star < 2e20

    # winner payload: min leaf index whose UNSORTED t0 (then t1) equals
    # t_star bitwise (t_star passed through max/min only).  Leaf ids ride
    # as f32 (exact ≤ 2^24); padded rows carry id L (the "no match"
    # sentinel the jnp path uses).
    t0 = t0_ref[...]                                # (Lt, bw) unsorted
    t1 = t1_ref[...]
    Lt = t0.shape[0]
    lf = jax.lax.broadcasted_iota(jnp.int32, (Lt, bw), 0).astype(jnp.float32)
    lf = jnp.where(lf < float(L_true), lf, float(L_true))
    ts_row = t_star[None, :]
    m_start = jnp.min(jnp.where(t0 == ts_row, lf, float(L_true)), axis=0)
    m_end = jnp.min(jnp.where(t1 == ts_row, lf, float(L_true)), axis=0)

    one = jnp.ones((bw,), jnp.float32)
    zero = jnp.zeros((bw,), jnp.float32)
    out_ref[...] = jnp.stack([
        t_star,
        jnp.where(entering, one, zero),
        m_start,
        m_end,
        jnp.where(found, one, zero),
        zero, zero, zero,
    ], axis=0)


def build_sweep_select(S: int, L: int, eps: float, interpret: bool = False,
                       sort: bool = True):
    """Compile the sweep for S pooled intervals over L leaves.

    Returns ``f(s, e, t0, t1) -> (t_star, entering, m_start, m_end,
    found)`` with inputs (S, B)/(L, B) f32 and outputs (B,).  With
    ``sort=True`` (default) s/e are the RAW valid-masked intervals and
    the kernel sorts them in VMEM; with ``sort=False`` they must be
    pre-sorted by s.  B is padded to a block multiple only when needed.
    """
    if sort:
        Sp = max(8, 1 << (S - 1).bit_length())      # bitonic: power of 2
    else:
        Sp = max(8, -(-S // 8) * 8)
    Lp = max(8, -(-L // 8) * 8)
    kern = functools.partial(_kernel, Lp=Sp, L_true=L, eps=eps,
                             do_sort=sort)

    @jax.jit
    def f(s_in, e_in, t0, t1):
        B = s_in.shape[1]
        Bp = -(-B // _BW) * _BW

        def prep(a, rows_have, rows_want, fill):
            if rows_have == rows_want and Bp == B:
                return a
            out = jnp.full((rows_want, Bp), fill, jnp.float32)
            return out.at[:rows_have, :B].set(a)

        # pad starts with PAD_T (sorts/stays at the end, never breaks),
        # ends with NEG (never extends a chain, never wins the final max
        # unless all are NEG — then < EPS ⇒ masked)
        s_p = prep(s_in, S, Sp, _PAD_T)
        e_p = prep(e_in, S, Sp, _NEG)
        t0_p = prep(t0, L, Lp, _PAD_T)
        t1_p = prep(t1, L, Lp, _NEG)

        grid = Bp // _BW
        blk = lambda r: pl.BlockSpec((r, _BW), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[blk(Sp), blk(Sp), blk(Lp), blk(Lp)],
            out_specs=pl.BlockSpec((8, _BW), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, Bp), jnp.float32),
            interpret=interpret,
        )(s_p, e_p, t0_p, t1_p)
        out = out[:, :B] if Bp != B else out
        return (out[0], out[1] > 0.5,
                out[2].astype(jnp.int32), out[3].astype(jnp.int32),
                out[4] > 0.5)

    return f
