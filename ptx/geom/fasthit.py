"""Direct first-hit evaluation — the hot-path replacement for cascaded
span merges.

Observation: the integrator (path-trace.h:59-99) consumes only the FIRST
qualifying boundary of the root CSG solid's span list.  Materializing the
merged span list per CSG node (ptx.geom.spans: one 2K-event sort per node)
does far more work than that answer needs.  Equivalent one-pass scheme:

1. every primitive leaf contributes its 2 boundary times — 2L candidates
   for L leaves (no ordering ever imposed on them);
2. root *insideness* just before / just after each candidate comes from
   evaluating the boolean CSG tape over per-leaf membership bits
   (``t0 < t <= t1`` / ``t0 <= t < t1``) — two (2L × L) compare tensors
   and two boolean folds, pure vectorized algebra, no merging;
3. a candidate where before ≠ after is a boundary of the root solid;
   the first-hit walk collapses to "**minimum** boundary with
   ``t >= EPS``" — provably identical to the reference's per-span
   condition ladder, because a span's qualifying boundary is always the
   earliest root boundary ≥ EPS:
   - that boundary's ``t >= MAX_VALUE``  ⇒ escaped (sky sentinel rule),
   - inside-after  ⇒ entry hit (leaf normal, 1/ior),
   - outside-after ⇒ exit hit (negated normal, ior);
4. boundary payload = the generating leaf's normal/material; a leaf under
   the B-side of an odd number of ``Difference`` nodes negates its normal
   (the ``copyEndFromStart``/``copyStartFromEnd`` rule, span.h:100-112),
   so ``final = n_event · parity · (+1 entry / −1 exit)``.

Exactly-coincident boundaries (touching union spans) merge automatically:
both membership bits flip inside one evaluation, so no root transition is
seen — the union-coalescing rule without any sort tie-break.  Degenerate
tangencies (measure-zero under jittered sampling) report as misses where
the reference emits zero-length spans.

Cost per ray: two (2L × L) bool compare/fold tensors + one argmin —
no sort at all — versus ~nodes × sort(2K·9 channels) for the merge
cascade.  No span-capacity ceiling, same gradients (boundary ``t``/
normals differentiable, selection index stop-gradient).  Cross-checked
against the span-merge path in tests/test_fasthit.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ptx.core import linalg
from ptx.core.constants import EPS, MAX_VALUE
from ptx.geom import primitives, tape

_PAD_T = jnp.float32(3e20)


def compile_fast_hit(plan, params_ref=None):
    """Compile a tape plan (from tape.compile_geometry) into
    ``hit_fn(params, origin, dir) -> first-hit dict`` (same contract as
    ptx.integrate.trace.first_hit)."""

    # ---- flatten leaves with difference-B parity -------------------------
    leaves = []            # (_LeafPlan, parity_sign)

    def walk(node, parity):
        if isinstance(node, tape._LeafPlan):
            leaves.append((node, parity))
        elif node.op == "difference":
            walk(node.children[0], parity)
            walk(node.children[1], -parity)
        else:
            for c in node.children:
                walk(c, parity)

    walk(plan, 1.0)
    L = len(leaves)
    parity = jnp.asarray(np.array([p for _, p in leaves], np.float32))
    mat_ids = jnp.asarray(np.array([lf.mat_id for lf, _ in leaves], np.int32))

    # ---- boolean tape over leaf bits ------------------------------------
    leaf_pos = {id(lf): i for i, (lf, _) in enumerate(leaves)}

    def tape_bits(node, bits):
        """bits: (..., L) leaf membership -> (...,) root membership."""
        if isinstance(node, tape._LeafPlan):
            return bits[..., leaf_pos[id(node)]]
        kids = [tape_bits(c, bits) for c in node.children]
        if node.op == "union":
            out = kids[0]
            for k in kids[1:]:
                out = out | k
            return out
        if node.op == "intersection":
            out = kids[0]
            for k in kids[1:]:
                out = out & k
            return out
        return kids[0] & ~kids[1]          # difference

    # ---- per-leaf interval kernels --------------------------------------
    def leaf_intervals(params, origin, direction):
        """Returns t0, t1 (B, L), n0, n1 (B, L, 3), valid (B, L)."""
        t0s, t1s, n0s, n1s, vs = [], [], [], [], []
        for lf, _p in leaves:
            o, d = origin, direction
            if lf.xform_chain:
                w = params["xform"][lf.xform_chain[0]]
                for i in lf.xform_chain[1:]:
                    w = linalg.compose(w, params["xform"][i])
                w_inv = linalg.inverse(w)
                o, d = linalg.transform_ray(w_inv, o, d)
                nrm_mat = jnp.transpose(w_inv[:, :3])
            else:
                nrm_mat = None
            if lf.kind == "sphere":
                sl = primitives.sphere_spans(
                    o, d, params["sphere_center"][lf.index],
                    params["sphere_radius"][lf.index], lf.mat_id)
            else:
                sl = primitives.plane_spans(
                    o, d, params["plane_normal"][lf.index],
                    params["plane_d"][lf.index], lf.mat_id)
            n0 = sl.n0[..., 0, :]
            n1 = sl.n1[..., 0, :]
            if nrm_mat is not None:
                n0 = _apply_norm(nrm_mat, n0)
                n1 = _apply_norm(nrm_mat, n1)
            t0s.append(sl.t0[..., 0])
            t1s.append(sl.t1[..., 0])
            n0s.append(n0)
            n1s.append(n1)
            vs.append(sl.valid[..., 0])
        stack = lambda xs, ax=-1: jnp.stack(xs, axis=ax)
        return (stack(t0s), stack(t1s), stack(n0s, -2), stack(n1s, -2),
                stack(vs))

    def hit_fn(params, origin, direction):
        """Sort-free first hit.

        Every leaf boundary time ``t_i`` is a *candidate*; root membership
        just before (``t0 < t <= t1``) and just after (``t0 <= t < t1``)
        each candidate is evaluated independently — two (B, 2L, L) compare
        tensors folded through the boolean tape.  A candidate where the
        two differ is a boundary of the root solid; the first-hit walk
        (path-trace.h:66-99) reduces to the *minimum* boundary with
        ``t >= EPS``.  Exactly-coincident boundaries merge automatically
        (both memberships flip inside one evaluation — the union
        coalescing rule), so no sort, no tie-break, no permutation.
        """
        t0, t1, n0, n1, valid = leaf_intervals(params, origin, direction)
        t0 = jnp.where(valid, t0, _PAD_T)
        t1 = jnp.where(valid, t1, _PAD_T)

        t_evt = jnp.concatenate([t0, t1], axis=-1)              # (B, 2L)
        ts = t_evt[..., :, None]                                 # (B, 2L, 1)
        lo = t0[..., None, :]                                    # (B, 1, L)
        hi = t1[..., None, :]
        after = (lo <= ts) & (ts < hi)
        before = (lo < ts) & (ts <= hi)
        root_after = tape_bits(plan, after)                      # (B, 2L)
        root_before = tape_bits(plan, before)
        candidate = (root_after != root_before) & (t_evt >= EPS)

        t_masked = jnp.where(candidate, t_evt, _PAD_T)
        idx = jax.lax.stop_gradient(jnp.argmin(t_masked, axis=-1))
        any_trigger = jnp.any(candidate, axis=-1)

        take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
        t_hit = take(t_evt)
        escaped = t_hit >= MAX_VALUE
        hit = any_trigger & ~escaped
        entering = take(root_after)    # inside just after ⇒ entry boundary

        leaf_idx = idx % L
        n_all = jnp.concatenate([n0, n1], axis=-2)               # (B, 2L, 3)
        n_evt = jnp.take_along_axis(
            n_all, idx[..., None, None], axis=-2)[..., 0, :]
        sign = parity[leaf_idx] * jnp.where(entering, 1.0, -1.0)
        normal = n_evt * sign[..., None]
        mat_id = mat_ids[leaf_idx]

        return {
            "t": jnp.where(hit, t_hit, 0.0),
            "normal": normal,
            "mat_id": jax.lax.stop_gradient(jnp.where(hit, mat_id, 0)),
            "entering": entering,
            "hit": hit,
        }

    return hit_fn


def _apply_norm(nrm_mat, n):
    out = jnp.einsum("ij,...j->...i", nrm_mat, n)
    mag = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.where(mag == 0, 1.0, mag)
