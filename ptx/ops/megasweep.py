"""Fused union-sweep first-hit megakernel with spatial cluster culling.

The jnp union sweep (ptx.geom.fasthit._compile_union_sweep, fixpoint
mode) is HBM-bound: interval construction writes two (L, B) tensors,
then the coverage fixpoint and the payload equality match re-read them
once per pass — ~6-10 full (L, B) HBM round-trips per bounce (≈67 MB
each at L=256, B=65k; the measured ~6 ms/bounce wall at L=256,
STATUS.md round 3).  The arithmetic itself is ~25 flops per (leaf, ray)
cell — trivially VPU-feasible if the intervals never leave VMEM.

This kernel runs the ENTIRE sweep in one launch per ray block:

1. leaf intervals are constructed IN VMEM from a (L_pad, 8) packed leaf
   table (sphere: cx cy cz r; plane: nx ny nz d; col 4 = original leaf
   id, col 5 = coverage mask) — HBM traffic is the rays in and five
   (B,) rows out, ~50× less than the jnp path;
2. compound gadgets' coverage comes from **interval-set slot algebra**
   instead of the jnp path's local membership fold + dedup sorts + rank
   pairing.  Key fact: the global sweep only needs interval SETS whose
   union equals the coverage — disjointness is never required (the
   chain-exit fixpoint merges overlaps by construction, and
   ``min start`` / ``has_below`` are functions of the union alone).  So
   each gadget's tape compiles to closed-form slots over its member
   intervals: ``∩`` = pairwise ``[max s, min e)``, ``∪`` = slot concat,
   ``A − B`` = ``A ∩ comp(B)`` with per-slot complements
   ``{[-MAX, s), [e, MAX)}`` — all elementwise max/min on member-major
   (G, bw) row blocks, pointwise-exact for the half-open ``s ≤ t < e``
   membership the dense fold evaluates;
3. the sort-free coverage fixpoint (``E ← max(E, max{e : s ≤ E})``, the
   exact chain-exit recurrence of fasthit's fixpoint mode) iterates to
   convergence in VMEM via ``lax.while_loop`` with a (1, bw) carry,
   over leaf-group rows + slot rows;
4. the winner's payload (min original-leaf-id whose RAW t0 / t1 equals
   t_star bitwise — the dense tie-break; slot endpoints are max/min of
   leaf events, hence bitwise leaf events) is an equality match against
   the raw member/leaf intervals.

**Spatial culling** (VERDICT r3 #1): sphere rows are Morton-ordered at
compile time and grouped into clusters of ``CLUSTER`` rows; every
cluster's bounding sphere is computed at RUNTIME from the live params
(training-time geometry drift can never break correctness — only
cluster QUALITY depends on the compile-time assignment), and a cheap
XLA pass tests every (cluster, ray-block) pair: a block where NO lane
hits the bound skips that cluster's construction (its rows become PAD —
exactly what the unculled math produces for a bound-missing ray, so the
payload tie-break also stays exact).  Compound gadgets additionally
carry per-cluster SOLID bounds (tape-derived: ``bound(∩)`` = any
bounded child, ``bound(∪)`` = enclosure of all, ``bound(−)`` =
``bound(A)``): a block missing the solid bound skips the gadget's slot
construction even when member primitives are hit.  Planes are unbounded
and always constructed.  Culling is block-coherent: coherent
primary/shadow blocks skip most of the scene, incoherent blocks degrade
to the unculled cost plus a scalar test each.

Semantics match the fixpoint sweep observable-for-observable: same
interval formulas (ptx.geom.fasthit._leaf_intervals), same
``valid = (s < e) & (e ≥ EPS)`` masking, same entry/exit selection and
min-leaf-id tie-break — cross-checked in tests/test_large_scenes.py
(interpret mode) and tools/mega_check.py (real chip).

Eligibility: union-decomposable tapes over untransformed sphere/plane
leaves whose compound groups stay within ``SLOT_MAX`` algebra slots —
the reference's ``unionArray`` big-scene shape, primitives AND gadgets
(/root/reference/src/test.cpp:52-64,126-144).  Transformed leaves keep
the jnp fixpoint path.

Mosaic notes (CLAUDE.md): all register state f32 — masks ride as f32
0/1 where select chains would mix bools; leaf ids ride as f32 (exact
< 2²⁴); the while_loop vector carry + scalar-prefetch pl.when pattern
was validated on this toolchain before this module was built.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptx.core.constants import EPS, MAX_VALUE

_PAD_T = np.float32(3e20)
_NEG = np.float32(-3e20)
# ray lanes per block: bigger blocks amortize per-block overhead (cull
# flag reads, launch fixed costs) but the chain-exit fixpoint iterates
# until EVERY lane in the block converges, and block-coherent culling
# degrades as blocks widen.  512 confirmed optimal round 4 (wall fwd
# at L=256/gadget-268: 512 → 71.8/57.8, 1024 → 69.0/56.7,
# 256 → 60.4/49.0; re-checked at CLUSTER=64: 1024 → 70.6/59.8 vs
# 512 → 75.7/62.4; PTX_MEGA_BW to re-sweep).
_BW = int(os.environ.get("PTX_MEGA_BW", "512"))
# gate self-test knob (tools/mega_check.py --selftest): shifts every
# sphere t0 by a constant INSIDE the kernel, simulating a kernel bug
# whose flips are NOT f64-adjudicable as boundary rounding — the
# class-aware gate must fail on it even below the fraction threshold.
_PERTURB = float(os.environ.get("PTX_MEGA_PERTURB", "0"))
# sphere rows per cull cluster: smaller clusters cull finer but
# multiply flags, pl.when segments, and table slices — and at 512-lane
# ray blocks fine-grained culls rarely fire, so coarser wins.  Round-4
# sweep (wall fwd / fwd+bwd at L=256 and gadget-268):
#   8 → 64.7/46.1, 50.3/36.8    16 → 69.2/49.0, 57.2/40.9
#  32 → 73.5/50.1, 58.9/42.7    64 → 75.2/51.1, 62.2/44.5
# 128 → 74.3/49.2, 61.1/44.4   (PTX_MEGA_CLUSTER to re-sweep)
CLUSTER = int(os.environ.get("PTX_MEGA_CLUSTER", "64"))
SLOT_MAX = 8         # algebra slots per gadget before falling back


def _morton(xyz):
    """(N, 3) float centers → Morton codes (spatial sort keys)."""
    xyz = np.asarray(xyz, np.float64)
    lo = xyz.min(axis=0)
    span = np.maximum(xyz.max(axis=0) - lo, 1e-6)
    q = np.clip(((xyz - lo) / span * 1023).astype(np.uint32), 0, 1023)
    code = np.zeros(len(xyz), np.uint64)
    for b in range(10):
        for a in range(3):
            code |= ((q[:, a].astype(np.uint64) >> b) & 1) << (3 * b + a)
    return code


# --------------------------------------------------------------------------
# compile-time gadget analysis: slot algebra + bound expressions
# --------------------------------------------------------------------------

def _slot_algebra(node, local_pos):
    """Gadget tape → interval-set slots [(s_expr, e_expr)] whose UNION is
    the gadget's coverage, pointwise-exact for half-open membership.
    Exprs: ("t0", j) | ("t1", j) | ("neg",) | ("pos",) | ("max"/"min", a, b).
    Returns None when the expansion exceeds SLOT_MAX."""
    from ptx.geom import tape as _tape

    def inter(A, B):
        return [(("max", sa, sb), ("min", ea, eb))
                for (sa, ea) in A for (sb, eb) in B]

    def comp(B):
        """complement of ⋃B: product expansion of per-slot complements
        {[-MAX, s), [e, MAX)} — 2^|B| slots."""
        out = [(("neg",), ("pos",))]
        for (sb, eb) in B:
            out = inter(out, [(("neg",), sb), (eb, ("pos",))])
            if len(out) > SLOT_MAX:
                return None
        return out

    def walk(n):
        if isinstance(n, _tape._LeafPlan):
            j = local_pos[id(n)]
            return [(("t0", j), ("t1", j))]
        kids = [walk(c) for c in n.children]
        if any(k is None for k in kids):
            return None
        if n.op == "union":
            out = [s for k in kids for s in k]
        elif n.op == "intersection":
            out = kids[0]
            for k in kids[1:]:
                out = inter(out, k)
                if len(out) > SLOT_MAX:
                    return None
        else:                                        # difference
            cb = comp(kids[1])
            if cb is None:
                return None
            out = inter(kids[0], cb)
        return out if len(out) <= SLOT_MAX else None

    return walk(node)


def _bound_expr(node, local_pos):
    """Conservative bounding-sphere expression for a gadget's root solid:
    ("leaf", j) | ("enclose", [children]) | None (unbounded).
    bound(∩) = any bounded child; bound(∪) = enclosure of all (None if
    any unbounded); bound(A − B) = bound(A)."""
    from ptx.geom import tape as _tape

    if isinstance(node, _tape._LeafPlan):
        return (("leaf", local_pos[id(node)])
                if node.kind == "sphere" else None)
    kids = [_bound_expr(c, local_pos) for c in node.children]
    if node.op == "intersection":
        for k in kids:
            if k is not None:
                return k
        return None
    if node.op == "difference":
        return kids[0]
    if any(k is None for k in kids):
        return None
    return ("enclose", kids)


def mega_eligible(plan, leaves) -> bool:
    """True iff every leaf is a sphere/plane and every compound union
    operand compiles to ≤ SLOT_MAX algebra slots.  Transformed leaves
    are eligible since round 5: the packed leaf table carries each row's
    world→object affine + A^{-T} (the replay row layout,
    ptx.geom.hitreplay) and the kernel transforms rays per row in VMEM —
    the reference's ``TransformedObject`` vocabulary
    (/root/reference/include/object.h:45-70) at full kernel speed."""
    from ptx.geom import fasthit, tape as _tape

    if not all(lf.kind in ("sphere", "plane") for lf, _ in leaves):
        return False
    for g in fasthit.union_decompose(plan):
        if isinstance(g, _tape._LeafPlan):
            continue
        sub = fasthit.collect_leaves(g)
        local_pos = {id(lf): j for j, (lf, _) in enumerate(sub)}
        if _slot_algebra(g, local_pos) is None:
            return False
    return True


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------

def _kernel(flags_ref, rays_ref, tbl_ref, *refs, sphere_runs, plane_rows,
            classes, Lp, Sp, eps, bounce=False, in_depth_fi=0,
            xform=False):
    """One ray block.

    sphere_runs: [(flag_idx, r0, rows)] — cluster-culled sphere row
    segments (leaf-group AND gadget-member rows alike).
    plane_rows: (r0, rows) always-active plane range, or None.
    classes: [(solid_flag0, n_clusters, seg_rows, p_base, Gp, slots)] —
    per compound class; slot construction reads member rows at
    ``p_base + j·Gp`` and writes slot rows at class's coverage base;
    ``slots`` = (cov_base, [(s_expr, e_expr)]).

    ``xform``: the table is the 32-wide replay-row layout (cols 0-25 =
    hitreplay rows: geo head 4 + plane inv_mag + W(12) + A^{-T}(9);
    26 lid, 27 cov, 28 mat, 29 par, 30 kind) and rays are transformed
    world→object PER ROW before the interval formulas; the winner's
    whole row is fetched by ONE MXU one-hot dot against the transposed
    table (tblT input) for the in-kernel replay forward.  The
    untransformed table stays 16-wide with broadcast rays (zero extra
    cost for the common case).
    """
    if xform:
        tblT_ref, refs = refs[0], refs[1:]
    if bounce:
        mat2_ref, out_ref, t0_scr, t1_scr, cs_scr, ce_scr = refs
    else:
        out_ref, t0_scr, t1_scr, cs_scr, ce_scr = refs
    C_LID, C_COV, C_MAT, C_PAR, C_KIND = ((26, 27, 28, 29, 30) if xform
                                          else (4, 5, 6, 7, 8))
    bw = rays_ref.shape[1]
    blk = pl.program_id(0)
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    a = dx * dx + dy * dy + dz * dz                  # (1, bw)
    sa = jnp.where(a == 0.0, 1.0, a)
    a_ok = jnp.where(a != 0.0, 1.0, 0.0)             # f32 mask

    def write_pad(scr, r0, rows):
        scr[r0:r0 + rows, :] = jnp.full((rows, bw), _PAD_T, jnp.float32)

    def row_ray(r0, rows):
        """Per-row object-space ray ((rows, bw) each) + per-row a/sa/ok.
        Identity W rows reproduce the broadcast ray bit-exactly (the
        transform is exact adds/mults of 0/1 coefficients)."""
        if not xform:
            return (ox, oy, oz, dx, dy, dz, a, sa, a_ok)
        w = [tbl_ref[r0:r0 + rows, 5 + j:6 + j] for j in range(12)]
        lox = w[0] * ox + w[1] * oy + w[2] * oz + w[3]
        loy = w[4] * ox + w[5] * oy + w[6] * oz + w[7]
        loz = w[8] * ox + w[9] * oy + w[10] * oz + w[11]
        ldx = w[0] * dx + w[1] * dy + w[2] * dz
        ldy = w[4] * dx + w[5] * dy + w[6] * dz
        ldz = w[8] * dx + w[9] * dy + w[10] * dz
        ar = ldx * ldx + ldy * ldy + ldz * ldz       # (rows, bw)
        sar = jnp.where(ar == 0.0, 1.0, ar)
        ar_ok = jnp.where(ar != 0.0, 1.0, 0.0)
        return (lox, loy, loz, ldx, ldy, ldz, ar, sar, ar_ok)

    def build_spheres(r0, rows):
        cx = tbl_ref[r0:r0 + rows, 0:1]              # (rows, 1)
        cy = tbl_ref[r0:r0 + rows, 1:2]
        cz = tbl_ref[r0:r0 + rows, 2:3]
        r = tbl_ref[r0:r0 + rows, 3:4]
        lid = tbl_ref[r0:r0 + rows, C_LID:C_LID + 1]
        rox, roy, roz, rdx, rdy, rdz, ra, rsa, ra_ok = row_ray(r0, rows)
        ocx = rox - cx                               # (rows, bw)
        ocy = roy - cy
        ocz = roz - cz
        b = ocx * rdx + ocy * rdy + ocz * rdz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - ra * cc
        ok = jnp.where(disc > eps, ra_ok, 0.0)       # f32 mask
        ok = ok * jnp.where(lid < float(Lp + 1), 1.0, 0.0)  # real rows only
        sq = jnp.sqrt(jnp.where(ok > 0.5, disc, 1.0))
        t0 = (-b - sq) / rsa + _PERTURB
        t1 = (-b + sq) / rsa
        # RAW intervals, exactly _leaf_intervals' contract: miss ⇒ PAD in
        # both; valid-masking happens at the fixpoint reads below
        t0_scr[r0:r0 + rows, :] = jnp.where(ok > 0.5, t0, _PAD_T)
        t1_scr[r0:r0 + rows, :] = jnp.where(ok > 0.5, t1, _PAD_T)

    # sphere clusters: construction gated per (cluster, block); flags is
    # a scalar-prefetch (n_flags, n_blocks) table — SMEM-resident,
    # dynamically indexable (PrefetchScalarGridSpec)
    for fi, r0, rows in sphere_runs:
        flag = flags_ref[fi, blk]

        @pl.when(flag > 0)
        def _(r0=r0, rows=rows):
            build_spheres(r0, rows)

        @pl.when(flag <= 0)
        def _(r0=r0, rows=rows):
            write_pad(t0_scr, r0, rows)
            write_pad(t1_scr, r0, rows)

    # planes: unbounded — always constructed (same formulas as
    # fasthit._leaf_intervals' plane branch)
    if plane_rows is not None:
        r0, rows = plane_rows
        nx = tbl_ref[r0:r0 + rows, 0:1]
        ny = tbl_ref[r0:r0 + rows, 1:2]
        nz = tbl_ref[r0:r0 + rows, 2:3]
        dpl = tbl_ref[r0:r0 + rows, 3:4]
        lid = tbl_ref[r0:r0 + rows, C_LID:C_LID + 1]
        rox, roy, roz, rdx, rdy, rdz, _, _, _ = row_ray(r0, rows)
        divisor = nx * rdx + ny * rdy + nz * rdz     # (rows, bw)
        numer = -dpl - (nx * rox + ny * roy + nz * roz)
        small = jnp.where(jnp.abs(divisor) < eps * eps, 1.0, 0.0)
        safe_div = jnp.where(small > 0.5, 1.0, divisor)
        t = numer / safe_div
        degen = jnp.maximum(small, jnp.where(jnp.abs(t) >= MAX_VALUE,
                                             1.0, 0.0))
        on_b = jnp.where(jnp.abs(numer) < eps * eps, 1.0, 0.0)
        entering_half = jnp.where(divisor < 0.0, 1.0, 0.0)
        full = degen * on_b
        ok = (1.0 - degen * (1.0 - on_b)) * jnp.where(
            lid < float(Lp + 1), 1.0, 0.0)
        t0 = jnp.where(full > 0.5, -MAX_VALUE,
                       jnp.where(entering_half > 0.5, t, -MAX_VALUE))
        t1 = jnp.where(full > 0.5, MAX_VALUE,
                       jnp.where(entering_half > 0.5, MAX_VALUE, t))
        t0_scr[r0:r0 + rows, :] = jnp.where(ok > 0.5, t0, _PAD_T)
        t1_scr[r0:r0 + rows, :] = jnp.where(ok > 0.5, t1, _PAD_T)

    # compound classes: slot algebra on member-major (seg, bw) blocks
    for (solid_f0, n_cl, seg_rows, Gp, cov_base, slots) in classes:
        for k in range(n_cl):
            g0 = k * seg_rows
            seg = min(seg_rows, Gp - g0)
            flag = flags_ref[solid_f0 + k, blk]

            def eval_expr(ex, g0=g0, seg=seg):
                tag = ex[0]
                if tag == "t0row":              # absolute member row base
                    r = ex[1] + g0
                    return t0_scr[r:r + seg, :]
                if tag == "t1row":
                    r = ex[1] + g0
                    return t1_scr[r:r + seg, :]
                if tag == "neg":
                    return jnp.full((seg, bw), -MAX_VALUE, jnp.float32)
                if tag == "pos":
                    return jnp.full((seg, bw), MAX_VALUE, jnp.float32)
                if tag == "max":
                    return jnp.maximum(eval_expr(ex[1]), eval_expr(ex[2]))
                assert tag == "min", tag
                return jnp.minimum(eval_expr(ex[1]), eval_expr(ex[2]))

            @pl.when(flag > 0)
            def _(g0=g0, seg=seg, slots=slots, cov_base=cov_base, Gp=Gp):
                for si, (s_ex, e_ex) in enumerate(slots):
                    r = cov_base + si * Gp + g0
                    # PAD member inputs (misses) propagate exactly: any
                    # max/min with PAD either voids the slot (s=PAD ⇒
                    # invalid) or is clamped by a finite partner
                    cs_scr[r:r + seg, :] = eval_expr(s_ex)
                    ce_scr[r:r + seg, :] = eval_expr(e_ex)

            @pl.when(flag <= 0)
            def _(g0=g0, seg=seg, slots=slots, cov_base=cov_base, Gp=Gp):
                for si in range(len(slots)):
                    r = cov_base + si * Gp + g0
                    write_pad(cs_scr, r, seg)
                    write_pad(ce_scr, r, seg)

    # ---- coverage views + sort-free chain-exit fixpoint -----------------
    t0 = t0_scr[...]                                 # (Lp, bw) RAW
    t1 = t1_scr[...]
    covm = tbl_ref[:, C_COV:C_COV + 1]               # leaf-group rows only
    val_p = (covm * jnp.where(t0 < t1, 1.0, 0.0)
             * jnp.where(t1 >= eps, 1.0, 0.0))
    s_p = jnp.where(val_p > 0.5, t0, _PAD_T)
    e_p = jnp.where(val_p > 0.5, t1, _NEG)

    if Sp:
        cs = cs_scr[...]                             # (Sp, bw) slots
        ce = ce_scr[...]
        val_c = (jnp.where(cs < ce, 1.0, 0.0)
                 * jnp.where(ce >= eps, 1.0, 0.0))
        s_c = jnp.where(val_c > 0.5, cs, _PAD_T)
        e_c = jnp.where(val_c > 0.5, ce, _NEG)

    def cov_max(f_p, f_c):
        m = jnp.max(f_p(s_p, e_p), axis=0, keepdims=True)
        if Sp:
            m = jnp.maximum(m, jnp.max(f_c(s_c, e_c), axis=0,
                                       keepdims=True))
        return m

    below = cov_max(lambda s, e: jnp.where(s < eps, 1.0, 0.0),
                    lambda s, e: jnp.where(s < eps, 1.0, 0.0))
    has_below = below > 0.5                          # (1, bw)
    t_entry = -cov_max(lambda s, e: -s, lambda s, e: -s)   # min start
    E0 = cov_max(lambda s, e: jnp.where(s < eps, e, _NEG),
                 lambda s, e: jnp.where(s < eps, e, _NEG))

    def cond(c):
        return jnp.logical_not(c[1])

    def body(c):
        E, _ = c
        En = jnp.maximum(E, cov_max(
            lambda s, e: jnp.where(s <= E, e, _NEG),
            lambda s, e: jnp.where(s <= E, e, _NEG)))
        return En, jnp.all(En == E)

    E, _ = jax.lax.while_loop(cond, body, (E0, jnp.array(False)))

    t_star = jnp.where(has_below, E, t_entry)        # (1, bw)
    entering = jnp.where(has_below, 0.0, 1.0)
    found = jnp.where(t_star < 2e20, 1.0, 0.0)

    # ---- winner payload: min original-leaf-id equality match (RAW) ------
    lid_col = tbl_ref[:, C_LID:C_LID + 1]            # (Lp, 1)
    noid = float(Lp + 1)                             # > any real id
    m_start = jnp.min(jnp.where(t0 == t_star, lid_col, noid),
                      axis=0, keepdims=True)
    m_end = jnp.min(jnp.where(t1 == t_star, lid_col, noid),
                    axis=0, keepdims=True)

    # ---- in-kernel replay FORWARD (profiler round 4: the XLA replay's
    # (B, 26) row gathers were 10.8 of 15 ms/step at L=256 — per-lane
    # gathers cost ~40 ns/row on this chip while the winner's params are
    # already VMEM-resident here).  The winner's leaf row is selected by
    # a masked reduce (ids are unique), then t/normal evaluate with the
    # replay's exact formulas.  Gradients are NOT lost: the XLA-side
    # wrapper (fasthit._compile_mega_sweep) keeps the differentiable
    # replay as the custom-VJP backward and uses these values as the
    # forward — so the forward path has ZERO per-lane gathers.
    chosen = jnp.where(m_start < noid, m_start, m_end)   # (1, bw)
    wmask = lid_col == chosen                            # (Lp, bw)

    escaped = jnp.where(t_star >= MAX_VALUE, 1.0, 0.0)
    hit = found * (1.0 - escaped)                    # (1, bw) f32

    if xform:
        # the winner's WHOLE 32-wide replay row rides ONE MXU one-hot
        # dot against the transposed table — (32, Lp) × (Lp, bw) at
        # HIGHEST is exact (single nonzero term per lane); miss lanes
        # get all-zero rows (guarded below exactly like miss normals)
        wmaskf_pay = jnp.where(wmask, 1.0, 0.0)
        wrow = jax.lax.dot_general(
            tblT_ref[...], wmaskf_pay, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (32, bw)
        rw = lambda j: wrow[j:j + 1, :]
        p0, p1, p2, p3 = rw(0), rw(1), rw(2), rw(3)
        matid, par, kind = rw(C_MAT), rw(C_PAR), rw(C_KIND)
        # object-space ray through the winner's W (identity rows are
        # bit-exact pass-through)
        lox = rw(5) * ox + rw(6) * oy + rw(7) * oz + rw(8)
        loy = rw(9) * ox + rw(10) * oy + rw(11) * oz + rw(12)
        loz = rw(13) * ox + rw(14) * oy + rw(15) * oz + rw(16)
        ldx = rw(5) * dx + rw(6) * dy + rw(7) * dz
        ldy = rw(9) * dx + rw(10) * dy + rw(11) * dz
        ldz = rw(13) * dx + rw(14) * dy + rw(15) * dz
        # sphere branch in object space (hitreplay.recompute_flat)
        inv_r = 1.0 / jnp.where(p3 == 0.0, 1.0, p3)
        snx = (lox - p0 + t_star * ldx) * inv_r
        sny = (loy - p1 + t_star * ldy) * inv_r
        snz = (loz - p2 + t_star * ldz) * inv_r
        # plane branch: unit object-space normal via the packed inv_mag
        pim = rw(4)
        pnx, pny, pnz = p0 * pim, p1 * pim, p2 * pim
        k_s = jnp.where(kind > 0.5, 1.0, 0.0)
        ex = k_s * snx + (1.0 - k_s) * pnx
        ey = k_s * sny + (1.0 - k_s) * pny
        ez = k_s * snz + (1.0 - k_s) * pnz
        # world normal = A^{-T} · n_obj (renormalized below)
        nx0 = rw(17) * ex + rw(18) * ey + rw(19) * ez
        ny0 = rw(20) * ex + rw(21) * ey + rw(22) * ez
        nz0 = rw(23) * ex + rw(24) * ey + rw(25) * ez
    else:
        def sel(col):
            return jnp.max(
                jnp.where(wmask, tbl_ref[:, col:col + 1], _NEG),
                axis=0, keepdims=True)

        p0, p1, p2, p3 = sel(0), sel(1), sel(2), sel(3)
        matid = sel(C_MAT)
        par = sel(C_PAR)
        kind = sel(C_KIND)                           # 1 sphere / 0 plane

        # sphere branch (replay formulas, hitreplay.recompute_flat)
        r_sph = p3
        inv_r = 1.0 / jnp.where(r_sph == 0.0, 1.0, r_sph)
        ocx = ox - p0
        ocy = oy - p1
        ocz = oz - p2
        snx = (ocx + t_star * dx) * inv_r
        sny = (ocy + t_star * dy) * inv_r
        snz = (ocz + t_star * dz) * inv_r
        # plane branch
        pim = 1.0 / jnp.sqrt(jnp.maximum(p0 * p0 + p1 * p1 + p2 * p2,
                                         1e-30))
        pnx = p0 * pim
        pny = p1 * pim
        pnz = p2 * pim

        k_s = jnp.where(kind > 0.5, 1.0, 0.0)
        nx0 = k_s * snx + (1.0 - k_s) * pnx
        ny0 = k_s * sny + (1.0 - k_s) * pny
        nz0 = k_s * snz + (1.0 - k_s) * pnz
    # renormalize (replay does, after its identity A^{-T})
    mag = jnp.sqrt(nx0 * nx0 + ny0 * ny0 + nz0 * nz0)
    inv_m = 1.0 / jnp.where(mag == 0.0, 1.0, mag)
    sign = par * jnp.where(entering > 0.5, 1.0, -1.0) * inv_m
    h = hit > 0.5
    t_rep = jnp.where(h, t_star, 0.0)
    nx = jnp.where(h, nx0 * sign, 0.0)
    ny = jnp.where(h, ny0 * sign, 0.0)
    nz = jnp.where(h, nz0 * sign, 1.0)   # miss placeholder (replay contract)

    zero = jnp.zeros((1, bw), jnp.float32)
    head = [t_star, entering, m_start, m_end, found,
            t_rep, nx, ny, nz, jnp.where(h, matid, 0.0), hit,
            zero, zero, zero, zero, zero]
    if not bounce:
        out_ref[...] = jnp.concatenate(head, axis=0)
        return

    # ---- fused bounce (shade + scatter in the same launch) --------------
    # material scalars for the winning leaf ride ONE MXU one-hot dot:
    # mat2 is a (16, Lp) per-row material table, wmask the winner one-hot
    # — (16, Lp) × (Lp, bw) at HIGHEST reproduces the f32 scalars exactly
    # (single nonzero term per lane).  Miss lanes (no winner row) get
    # all-zero scalars; every downstream formula is guarded for that
    # (shade_lane_math's rel_ior/normalize guards, same as the flagship).
    from ptx.ops.bounce_kernel import shade_lane_math
    wmaskf = jnp.where(wmask, 1.0, 0.0)
    mats = jax.lax.dot_general(
        mat2_ref[...], wmaskf, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)              # (16, bw)
    mat9 = tuple(mats[j:j + 1, :] for j in range(9))

    thr = (rays_ref[6:7, :], rays_ref[7:8, :], rays_ref[8:9, :])
    strength = rays_ref[9:10, :]
    alive = rays_ref[10:11, :] > 0.5
    u_coin = rays_ref[11:12, :]
    u3 = (rays_ref[12:13, :], rays_ref[13:14, :], rays_ref[14:15, :])
    in_depth = flags_ref[in_depth_fi, 0] > 0
    ent_b = entering > 0.5

    o2, d2, thr2, st2, bflags, u_sel = shade_lane_math(
        t_rep, nx, ny, nz, h, ent_b, (ox, oy, oz), (dx, dy, dz),
        thr, strength, alive, u_coin, u3, in_depth, mat9)

    out_ref[...] = jnp.concatenate(
        head + [o2[0], o2[1], o2[2], d2[0], d2[1], d2[2],
                thr2[0], thr2[1], thr2[2], st2, bflags,
                u_sel[0], u_sel[1], u_sel[2], zero, zero],
        axis=0)


# --------------------------------------------------------------------------
# builder
# --------------------------------------------------------------------------

def build_mega_sweep(plan, leaves, eps: float = float(EPS),
                     params_ref=None, interpret: bool = False,
                     cull: bool = True, bounce_meta=None):
    """Compile the fused sweep for a mega-eligible tape.

    Returns ``f(params, ox, oy, oz, dx, dy, dz) -> (t_star, entering,
    m_start, m_end, found, t_rep, normal, mat_id, hit)`` with flat (B,)
    ray components; m_start/m_end are ORIGINAL leaf indices (sentinel
    L = no match) — the jnp fixpoint path's exact contract — and
    t_rep/normal/mat_id/hit are the in-kernel replay FORWARD values
    (stop-gradient; the caller supplies the differentiable backward via
    custom VJP — fasthit._compile_mega_sweep).

    ``bounce_meta = (const_idx, n_materials, leaf_mat)`` switches the
    kernel to FUSED-BOUNCE mode (hit + shade + scatter in the one
    launch, shade via bounce_kernel.shade_lane_math): the returned
    function then has the extended signature ``f(params, ox, oy, oz,
    dx, dy, dz, thr3, strength, alive_f, u_coin, u3a, u3b, u3c,
    in_depth)`` and additionally returns ``(o2₃, d2₃, thr2₃,
    strength2, bounce_flags, u_sel₃)`` rows after the hit outputs —
    the flagship bounce kernel's carry contract (eligibility: const
    non-emissive material slots, checked by the caller)."""
    from ptx.geom import fasthit, tape as _tape

    L = len(leaves)
    leaf_pos = {id(lf): i for i, (lf, _) in enumerate(leaves)}
    any_xform = any(lf.xform_chain for lf, _ in leaves)

    def _np_world_center(lf):
        """Compile-time world-space center for Morton cluster assignment
        (bounds themselves are always recomputed from live params)."""
        from ptx.core import linalg as _lin
        c = np.asarray(params_ref["sphere_center"])[lf.index]
        if lf.xform_chain:
            w = np.asarray(params_ref["xform"])[lf.xform_chain[0]]
            for j in lf.xform_chain[1:]:
                w = np.asarray(_lin.compose(
                    w, np.asarray(params_ref["xform"])[j]))
            c = w[:, :3] @ c + w[:, 3]
        return c

    # ---- decompose: leaf groups + compound classes -----------------------
    lg_s, lg_p = [], []            # leaf-group leaf positions
    classes = {}                   # sig → [rep, local_pos, [gadget leafpos]]

    def _sig(node, local_pos):
        if isinstance(node, _tape._LeafPlan):
            return ("L", node.kind, local_pos[id(node)])
        return (node.op, tuple(_sig(c, local_pos) for c in node.children))

    for g in fasthit.union_decompose(plan):
        if isinstance(g, _tape._LeafPlan):
            (lg_s if g.kind == "sphere" else lg_p).append(leaf_pos[id(g)])
        else:
            sub = fasthit.collect_leaves(g)
            lp = {id(lf): j for j, (lf, _) in enumerate(sub)}
            key = _sig(g, lp)
            if key not in classes:
                classes[key] = [g, lp, []]
            classes[key][2].append([leaf_pos[id(lf)] for lf, _ in sub])

    # Morton-order leaf-group spheres
    if lg_s and params_ref is not None:
        centers = np.stack([_np_world_center(leaves[i][0]) for i in lg_s])
        order = np.argsort(_morton(centers), kind="stable")
        lg_s = [lg_s[int(o)] for o in order]

    # ---- row layout ------------------------------------------------------
    # region P (raw leaf intervals): [leaf-group spheres | per-class
    # member-major sphere members | per-class plane members + leaf-group
    # planes | pad].  Sphere rows first so cull clusters are contiguous.
    sphere_rows = []       # (leaf position, covmask, flag_group_key)
    plane_rows_l = []      # (leaf position, covmask)
    class_meta = []        # per class dicts

    for i in lg_s:
        sphere_rows.append((i, 1.0, ("lg", len(sphere_rows) // CLUSTER)))

    for key, (rep, lp, gads) in classes.items():
        sub = fasthit.collect_leaves(rep)
        m = len(sub)
        G = len(gads)
        Gp = -(-G // 8) * 8
        slots = _slot_algebra(rep, lp)
        assert slots is not None, "mega ineligible tape reached builder"
        bexpr = _bound_expr(rep, lp)
        # Morton-order gadgets by their first sphere member's center
        if params_ref is not None:
            anchor = next((j for j, (lf, _) in enumerate(sub)
                           if lf.kind == "sphere"), None)
            if anchor is not None:
                centers = np.stack([_np_world_center(leaves[g[anchor]][0])
                                    for g in gads])
                order = np.argsort(_morton(centers), kind="stable")
                gads = [gads[int(o)] for o in order]
        class_meta.append({"rep": rep, "lp": lp, "gads": gads, "m": m,
                           "G": G, "Gp": Gp, "slots": slots,
                           "bexpr": bexpr, "sub": sub})

    # sphere member runs (member-major): class c member j → Gp rows
    for ci, cm in enumerate(class_meta):
        cm["member_row0"] = {}
        for j, (lf, _) in enumerate(cm["sub"]):
            if lf.kind != "sphere":
                continue
            cm["member_row0"][j] = len(sphere_rows)
            for gi in range(cm["Gp"]):
                pos = cm["gads"][gi][j] if gi < cm["G"] else None
                sphere_rows.append((pos, 0.0, ("cm", ci, j,
                                               gi // CLUSTER)))

    ns = -(-len(sphere_rows) // 8) * 8
    sphere_rows += [(None, 0.0, None)] * (ns - len(sphere_rows))

    # plane rows: class plane members (member-major) then leaf-group planes
    for ci, cm in enumerate(class_meta):
        for j, (lf, _) in enumerate(cm["sub"]):
            if lf.kind != "plane":
                continue
            cm["member_row0"][j] = ns + len(plane_rows_l)
            for gi in range(cm["Gp"]):
                pos = cm["gads"][gi][j] if gi < cm["G"] else None
                plane_rows_l.append((pos, 0.0))
    for i in lg_p:
        plane_rows_l.append((i, 1.0))
    npl = -(-len(plane_rows_l) // 8) * 8 if plane_rows_l else 0
    plane_rows_l += [(None, 0.0)] * (npl - len(plane_rows_l))
    Lp = max(8, ns + npl)

    # coverage slot rows (region C)
    cov_base = 0
    for cm in class_meta:
        cm["cov_base"] = cov_base
        cov_base += len(cm["slots"]) * cm["Gp"]
    Sp = cov_base

    # ---- static tables ---------------------------------------------------
    all_rows = ([(p, c) for (p, c, _f) in sphere_rows]
                + plane_rows_l + [(None, 0.0)] * (Lp - ns - npl))
    lid_rows = np.array([(p if p is not None else Lp + 1)
                         for p, _ in all_rows], np.float32)
    cov_rows = np.array([c for _, c in all_rows], np.float32)
    row_src = np.array([(leaves[p][0].index if p is not None else 0)
                        for p, _ in all_rows], np.int32)
    sphere_src = row_src[:ns]
    plane_src = row_src[ns:ns + npl] if npl else np.zeros(0, np.int32)
    sphere_real = np.array([p is not None
                            for p, _, _f in sphere_rows], bool)
    # per-row replay payload columns (in-kernel replay forward)
    mat_rows = np.array([(leaves[p][0].mat_id if p is not None else 0)
                         for p, _ in all_rows], np.float32)
    par_rows = np.array([(leaves[p][1] if p is not None else 1.0)
                         for p, _ in all_rows], np.float32)
    kind_rows = np.array(
        [(1.0 if (p is not None and leaves[p][0].kind == "sphere") else 0.0)
         for p, _ in all_rows], np.float32)

    # ---- cull flag layout ------------------------------------------------
    # one flag per sphere cluster (CLUSTER rows) + one per (class, gadget
    # cluster) solid bound.  Sphere clusters: contiguous row ranges.
    n_s_clusters = ns // CLUSTER if ns % CLUSTER == 0 else -(-ns // CLUSTER)
    sphere_runs = []
    for k in range(n_s_clusters):
        r0 = k * CLUSTER
        rows = min(CLUSTER, ns - r0)
        sphere_runs.append((k, r0, rows))
    flag_count = n_s_clusters
    kernel_classes = []
    for cm in class_meta:
        seg = CLUSTER
        n_cl = -(-cm["Gp"] // seg)
        cm["solid_f0"] = flag_count
        cm["n_cl"] = n_cl
        flag_count += n_cl
        # member rows are contiguous per member: p_base = member_row0[0]?
        # member-major: member j rows at member_row0[j] … + Gp.  The
        # kernel needs ONE p_base per class with stride Gp — true only if
        # members are laid out consecutively.  Sphere members are; plane
        # members live in the plane region.  Encode per-member bases via
        # expr rewriting instead: replace ("t0", j) with ("t0row", row0).
        kernel_classes.append((
            cm["solid_f0"], n_cl, seg, cm["Gp"], cm["cov_base"],
            [(_rebase(s, cm), _rebase(e, cm)) for (s, e) in cm["slots"]]))

    bounce = bounce_meta is not None
    if bounce:
        b_const_idx, _b_n_materials, _b_leaf_mat = bounce_meta
        mat_rows_i = mat_rows.astype(np.int32)       # per-ROW material id
    kern = functools.partial(
        _kernel, sphere_runs=sphere_runs,
        plane_rows=((ns, npl) if npl else None),
        classes=kernel_classes, Lp=Lp, Sp=Sp, eps=eps,
        bounce=bounce, in_depth_fi=flag_count, xform=any_xform)

    memb_j = jnp.asarray(sphere_src.reshape(-1))
    lid_j = jnp.asarray(lid_rows)[:, None]
    cov_j = jnp.asarray(cov_rows)[:, None]
    mat_j = jnp.asarray(mat_rows)[:, None]
    par_j = jnp.asarray(par_rows)[:, None]
    kind_j = jnp.asarray(kind_rows)[:, None]
    sreal_j = jnp.asarray(sphere_real)
    plane_src_j = jnp.asarray(plane_src) if npl else None
    # per-row leaf POSITION (pad rows → 0, masked by lid) — the xform
    # table gathers whole replay rows by position, and world-space cull
    # bounds are keyed by position (transformed leaves share sphere
    # indices with untransformed ones only by coincidence)
    row_pos = np.array([(p if p is not None else 0)
                        for p, _ in all_rows], np.int32)
    row_pos_j = jnp.asarray(row_pos)
    sphere_pos_j = jnp.asarray(row_pos[:ns])

    # per-class runtime bound gather indices
    for cm in class_meta:
        cm["bound_leaves"] = _bound_leaf_list(cm["bexpr"])
        if cm["bound_leaves"] is not None:
            idx = np.array(
                [[leaves[g[j]][0].index for j in cm["bound_leaves"]]
                 for g in cm["gads"]], np.int32)       # (G, nb_leaves)
            cm["bidx"] = jnp.asarray(idx)
            cm["bpos"] = jnp.asarray(np.array(
                [[g[j] for j in cm["bound_leaves"]]
                 for g in cm["gads"]], np.int32))      # leaf positions

    def f(params, ox, oy, oz, dx, dy, dz, *bargs):
        B = ox.shape[0]
        Bp = -(-B // _BW) * _BW
        nb = Bp // _BW

        def padb(v):
            return (v if Bp == B else
                    jnp.concatenate([v, jnp.zeros(Bp - B, v.dtype)]))

        if bounce:
            (th0, th1, th2, st_l, al_l, uc_l, ua_l, ub_l, up_l,
             in_depth) = bargs
            rays = jnp.stack(
                [padb(ox), padb(oy), padb(oz),
                 padb(dx), padb(dy), padb(dz),
                 padb(th0), padb(th1), padb(th2), padb(st_l),
                 padb(al_l), padb(uc_l), padb(ua_l), padb(ub_l),
                 padb(up_l), jnp.zeros(Bp, jnp.float32)],
                axis=0)                                         # (16, Bp)
        else:
            rays = jnp.stack([padb(ox), padb(oy), padb(oz),
                              padb(dx), padb(dy), padb(dz),
                              jnp.zeros(Bp, jnp.float32),
                              jnp.zeros(Bp, jnp.float32)], axis=0)

        if any_xform:
            # xform table (Lp, 32): the replay row layout per row (cols
            # 0-25: geo head 4 + plane inv_mag + W(12) + A^{-T}(9) —
            # hitreplay.leaf_rows, identity tails for untransformed
            # leaves) + [lid cov mat par kind pad]; pad rows carry leaf
            # 0's REAL row (lid masks them — the replay_bwd filler-lane
            # lesson: fabricated zero rows breed 0·inf downstream)
            from ptx.geom import hitreplay as _hr
            geo26 = _hr.leaf_rows(leaves, params)[row_pos_j]   # (Lp, 26)
            tbl = jnp.concatenate(
                [geo26, lid_j, cov_j, mat_j, par_j, kind_j,
                 jnp.zeros((Lp, 1), jnp.float32)], axis=1)
        else:
            # packed leaf table (Lp, 16):
            # [p0 p1 p2 p3 leaf_id covmask mat_id parity kind 0…]
            sc = params["sphere_center"][memb_j]             # (ns, 3)
            sr = params["sphere_radius"][memb_j][:, None]
            head_s = jnp.concatenate([sc, sr], axis=1)
            heads = [head_s]
            if npl:
                n = params["plane_normal"][plane_src_j]
                d = params["plane_d"][plane_src_j][:, None]
                heads.append(jnp.concatenate([n, d], axis=1))
            head = jnp.concatenate(heads, axis=0)
            if head.shape[0] < Lp:
                head = jnp.concatenate(
                    [head,
                     jnp.zeros((Lp - head.shape[0], 4), jnp.float32)])
            tbl = jnp.concatenate(
                [head, lid_j, cov_j, mat_j, par_j, kind_j,
                 jnp.zeros((Lp, 7), jnp.float32)], axis=1)
        tbl = jax.lax.stop_gradient(tbl)

        # ---- runtime cluster bounds + per-(flag, block) active table ----
        o_m = rays[0:3]                                      # (3, Bp)
        d_m = rays[3:6]
        a = jnp.sum(d_m * d_m, axis=0)                       # (Bp,)

        def block_hits(bc, br):
            """(nF, 3) centers + (nF,) radii → (nF, nb) any-lane flags."""
            oc = o_m[None] - bc[:, :, None]                  # (nF, 3, Bp)
            bq = jnp.sum(oc * d_m[None], axis=1)             # (nF, Bp)
            cc = jnp.sum(oc * oc, axis=1) - (br * br)[:, None]
            disc = bq * bq - a[None] * cc
            sa_ = jnp.where(a == 0.0, 1.0, a)[None]
            t1 = (-bq + jnp.sqrt(jnp.maximum(disc, 0.0))) / sa_
            act = (disc > 0.0) & (t1 >= eps) & (a[None] != 0.0)
            return jnp.any(act.reshape(-1, nb, _BW), axis=-1)

        if cull and not interpret:
            if any_xform:
                # world-space bounding spheres keyed by leaf POSITION
                # (conservative under the transform: |r|·‖W_lin‖_F ≥
                # |r|·σ_max — over-inclusion only costs cull quality,
                # never correctness)
                wb_c, wb_r = _leaf_world_bounds(leaves, params)
                cull_c = wb_c[sphere_pos_j]
                cull_r = wb_r[sphere_pos_j]
            else:
                cull_c, cull_r = sc, jnp.abs(sr[:, 0])
            # sphere-cluster bounds: enclosing sphere of real member rows
            bcs, brs = _cluster_bounds(cull_c, cull_r, sreal_j, CLUSTER)
            flag_rows = [block_hits(bcs, brs)]
            for cm2 in class_meta:
                if cm2["bound_leaves"] is None:
                    # unbounded root solid (e.g. union with a plane
                    # member): slots always construct
                    flag_rows.append(jnp.ones((cm2["n_cl"], nb), bool))
                else:
                    flag_rows.append(_class_solid_flags(
                        cm2, params, block_hits, CLUSTER,
                        world_bounds=((wb_c, wb_r) if any_xform
                                      else None)))
            flags = jnp.concatenate(flag_rows, axis=0).astype(jnp.int32)
            flags = jax.lax.stop_gradient(flags)
        else:
            flags = jnp.ones((max(flag_count, 1), nb), jnp.int32)

        ins = [rays, tbl]
        n_rays_rows = 16 if bounce else 8
        tw = 32 if any_xform else 16
        in_specs = [
            pl.BlockSpec((n_rays_rows, _BW), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, tw), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if any_xform:
            # transposed table for the winner-row MXU one-hot dot
            ins.append(jnp.transpose(tbl))
            in_specs.append(pl.BlockSpec((tw, Lp), lambda i, *_: (0, 0),
                                         memory_space=pltpu.VMEM))
        if bounce:
            # in_depth rides the scalar-prefetch table as one extra row
            # (index in_depth_fi = flag_count, static)
            idrow = jnp.broadcast_to(
                jnp.asarray(in_depth, jnp.int32).reshape(1, 1), (1, nb))
            flags = jnp.concatenate([flags, idrow], axis=0)
            # (16, Lp) per-ROW material scalar table for the in-kernel
            # one-hot MXU select (rows: rfl0..2 sc tr0..2 trc ior, pad)
            const = params["const"]
            mat_all = jnp.concatenate(
                [const[b_const_idx["reflect"]],
                 jnp.mean(const[b_const_idx["scatter"]],
                          axis=-1)[:, None],
                 const[b_const_idx["transmit"]],
                 jnp.mean(const[b_const_idx["transmit_reflect"]],
                          axis=-1)[:, None],
                 params["ior"][:, None]], axis=1)        # (M, 9)
            m2 = mat_all[jnp.asarray(mat_rows_i)]        # (Lp, 9)
            mat2 = jnp.concatenate(
                [m2.T, jnp.zeros((7, Lp), jnp.float32)], axis=0)
            ins.append(jax.lax.stop_gradient(mat2))
            in_specs.append(pl.BlockSpec((16, Lp), lambda i, *_: (0, 0),
                                         memory_space=pltpu.VMEM))

        n_out = 32 if bounce else 16
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,             # flags (n_flags, n_blocks)
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((n_out, _BW), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((Lp, _BW), jnp.float32),
                            pltpu.VMEM((Lp, _BW), jnp.float32),
                            pltpu.VMEM((max(Sp, 8), _BW), jnp.float32),
                            pltpu.VMEM((max(Sp, 8), _BW), jnp.float32)],
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_out, Bp), jnp.float32),
            interpret=interpret,
        )(flags, *ins)
        out = out[:, :B] if Bp != B else out
        out = jax.lax.stop_gradient(out)
        noid = float(Lp + 1)
        m_start = jnp.where(out[2] >= noid, L, out[2]).astype(jnp.int32)
        m_end = jnp.where(out[3] >= noid, L, out[3]).astype(jnp.int32)
        normal = jnp.stack([out[6], out[7], out[8]], axis=-1)
        base = (out[0], out[1] > 0.5, m_start, m_end, out[4] > 0.5,
                out[5], normal, out[9].astype(jnp.int32), out[10] > 0.5)
        if not bounce:
            return base
        o2 = jnp.stack([out[16], out[17], out[18]], axis=-1)
        d2 = jnp.stack([out[19], out[20], out[21]], axis=-1)
        thr2 = jnp.stack([out[22], out[23], out[24]], axis=-1)
        u_sel = jnp.stack([out[27], out[28], out[29]], axis=-1)
        return base + (o2, d2, thr2, out[25], out[26].astype(jnp.int32),
                       u_sel)

    return f


def _rebase(ex, cm):
    """Rewrite member indices to absolute scratch row bases:
    ("t0", j) → ("t0row", member_row0[j])."""
    tag = ex[0]
    if tag in ("t0", "t1"):
        return (tag + "row", cm["member_row0"][ex[1]])
    if tag in ("max", "min"):
        return (tag, _rebase(ex[1], cm), _rebase(ex[2], cm))
    return ex


def _cluster_bounds(centers, radii, real_mask, ck):
    """(ns, 3)/(ns,) rows → per-CLUSTER enclosing (nC, 3) + (nC,)."""
    ns = centers.shape[0]
    nC = -(-ns // ck)
    pad = nC * ck - ns
    if pad:
        centers = jnp.concatenate(
            [centers, jnp.zeros((pad, 3), jnp.float32)])
        radii = jnp.concatenate([radii, jnp.zeros((pad,), jnp.float32)])
        real_mask = jnp.concatenate(
            [real_mask, jnp.zeros((pad,), bool)])
    cm = centers.reshape(nC, ck, 3)
    rm = radii.reshape(nC, ck)
    mask = real_mask.reshape(nC, ck)
    big = jnp.float32(1e19)
    lo = jnp.min(jnp.where(mask[..., None], cm, big), axis=1)
    hi = jnp.max(jnp.where(mask[..., None], cm, -big), axis=1)
    bc = 0.5 * (lo + hi)
    dist = jnp.sqrt(jnp.sum((cm - bc[:, None, :]) ** 2, axis=-1))
    br = jnp.max(jnp.where(mask, dist + rm, 0.0), axis=1)
    # empty clusters (all-pad): zero-radius bound at a huge center would
    # still test false for every real ray (disc<0); keep radius 0
    br = jnp.where(jnp.any(mask, axis=1), br, 0.0)
    bc = jnp.where(jnp.any(mask, axis=1)[:, None], bc, 1e19)
    return jax.lax.stop_gradient(bc), jax.lax.stop_gradient(br)


def _bound_leaf_list(bexpr):
    """Flatten a bound expression to its sphere-leaf member indices, or
    None if unbounded."""
    if bexpr is None:
        return None
    out = []

    def walk(e):
        if e[0] == "leaf":
            out.append(e[1])
        else:
            for c in e[1]:
                walk(c)

    walk(bexpr)
    return out


def _leaf_world_bounds(leaves, params):
    """Runtime world-space bounding spheres per leaf POSITION:
    untransformed sphere → (c, |r|); transformed sphere → (W·c,
    |r|·‖W_lin‖_F) (Frobenius ≥ spectral norm — conservative, so culled
    clusters still equal true misses exactly).  Planes get far-away
    zero-radius bounds (plane rows are never culled and gadget
    bound_leaves are sphere members only).  Returns ((L, 3), (L,)),
    stop-gradient (bounds are selection structure, like the flags)."""
    from ptx.core import linalg as _lin

    parts_c, parts_r, order = [], [], []
    idx_plain = [i for i, (lf, _) in enumerate(leaves)
                 if lf.kind == "sphere" and not lf.xform_chain]
    if idx_plain:
        gi = np.array([leaves[i][0].index for i in idx_plain])
        parts_c.append(params["sphere_center"][gi])
        parts_r.append(jnp.abs(params["sphere_radius"][gi]))
        order += idx_plain
    # batched by chain length (the per-leaf compose chain costs O(L)
    # ops — the same lesson as hitreplay.leaf_rows' xf_groups)
    xf_groups: dict = {}
    for i, (lf, _p) in enumerate(leaves):
        if lf.kind == "sphere" and lf.xform_chain:
            xf_groups.setdefault(len(lf.xform_chain), []).append(i)
    for clen, idxs in xf_groups.items():
        gi = np.array([leaves[i][0].index for i in idxs])
        ch = np.array([leaves[i][0].xform_chain for i in idxs])
        w = params["xform"][ch[:, 0]]
        for j in range(1, clen):
            w = _lin.compose(w, params["xform"][ch[:, j]])
        lin, tvec = w[:, :, :3], w[:, :, 3]
        c = params["sphere_center"][gi]
        parts_c.append(jnp.einsum("nij,nj->ni", lin, c,
                                  precision=jax.lax.Precision.HIGHEST)
                       + tvec)
        parts_r.append(jnp.abs(params["sphere_radius"][gi])
                       * jnp.sqrt(jnp.sum(lin * lin, axis=(1, 2))))
        order += idxs
    idx_pl = [i for i, (lf, _) in enumerate(leaves) if lf.kind == "plane"]
    if idx_pl:
        parts_c.append(jnp.full((len(idx_pl), 3), 1e19, jnp.float32))
        parts_r.append(jnp.zeros((len(idx_pl),), jnp.float32))
        order += idx_pl
    c_all = jnp.concatenate(parts_c, axis=0)
    r_all = jnp.concatenate(parts_r, axis=0)
    inv = np.empty(len(leaves), np.int32)
    inv[np.array(order)] = np.arange(len(leaves))
    return (jax.lax.stop_gradient(c_all[inv]),
            jax.lax.stop_gradient(r_all[inv]))


def _class_solid_flags(cm, params, block_hits, ck, world_bounds=None):
    """(n_cl, nb) solid-bound flags for one compound class; unbounded
    classes (bound_leaves None) are handled by the caller (always
    active).  ``world_bounds``: ((L, 3), (L,)) position-keyed bounds for
    scenes with transformed leaves."""
    assert cm["bound_leaves"] is not None
    G, Gp = cm["G"], cm["Gp"]
    if world_bounds is not None:
        wb_c, wb_r = world_bounds
        pos = cm["bpos"]                               # (G, nbl)
        c = wb_c[pos.reshape(-1)].reshape(G, -1, 3)
        r = wb_r[pos.reshape(-1)].reshape(G, -1)
    else:
        idx = cm["bidx"]                               # (G, nbl)
        c = params["sphere_center"][idx.reshape(-1)].reshape(G, -1, 3)
        r = jnp.abs(params["sphere_radius"][idx.reshape(-1)]).reshape(
            G, -1)
    # per-gadget enclosing bound of its bound-leaf spheres
    lo = jnp.min(c - r[..., None], axis=1)
    hi = jnp.max(c + r[..., None], axis=1)
    bc = 0.5 * (lo + hi)                               # (G, 3)
    br = 0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=-1))
    if Gp > G:
        bc = jnp.concatenate([bc, jnp.full((Gp - G, 3), 1e19)], axis=0)
        br = jnp.concatenate([br, jnp.zeros((Gp - G,))], axis=0)
    mask = jnp.arange(Gp) < G
    bcc, brc = _cluster_bounds(bc, br, mask, ck)
    return block_hits(bcc, brc)
