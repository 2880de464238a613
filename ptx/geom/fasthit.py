"""Direct first-hit evaluation — the hot-path replacement for cascaded
span merges.

Observation: the integrator (path-trace.h:59-99) consumes only the FIRST
qualifying boundary of the root CSG solid's span list.  Materializing the
merged span list per CSG node (ptx.geom.spans: one 2K-event sort per node)
does far more work than that answer needs.  Equivalent one-pass scheme:

1. every primitive leaf contributes its 2 boundary events ``(t, leaf,
   is_start)`` — 2L events total for L leaves;
2. ONE batched sort orders the events (tie-break: starts before ends, so
   touching spans coalesce exactly like the reference union merge);
3. root *insideness* after each event comes from evaluating the boolean
   CSG tape over per-leaf membership bits ``t0_k <= t < t1_k`` — pure
   vectorized boolean algebra, no merging;
4. insideness *transitions* are the root solid's boundaries; the first-hit
   walk collapses to "first transition event with ``t >= EPS``" — provably
   identical to the reference's per-span condition ladder, because a
   span's qualifying boundary is always the earliest root boundary ≥ EPS:
   - that event's ``t >= MAX_VALUE``  ⇒ escaped (sky sentinel rule),
   - up-transition  ⇒ entry hit (leaf normal, 1/ior),
   - down-transition ⇒ exit hit (negated normal, ior);
5. boundary payload = the generating leaf's normal/material; a leaf under
   the B-side of an odd number of ``Difference`` nodes negates its normal
   (the ``copyEndFromStart``/``copyStartFromEnd`` rule, span.h:100-112),
   so ``final = n_event · parity · (+1 entry / −1 exit)``.

Cost per ray: one sort of 2L scalars + a (2L × L) compare + a boolean
fold — versus ~nodes × sort(2K·9 channels) for the merge cascade.  No
span-capacity ceiling, same gradients (event ``t``/normals differentiable,
selection index stop-gradient).  Cross-checked against the span-merge
path in tests/test_fasthit.py.
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
        t0, t1, n0, n1, valid = leaf_intervals(params, origin, direction)
        t0 = jnp.where(valid, t0, _PAD_T)
        t1 = jnp.where(valid, t1, _PAD_T)

        # events: starts then ends; tie-break starts-before-ends
        t_evt = jnp.concatenate([t0, t1], axis=-1)              # (B, 2L)
        tie = jnp.concatenate([jnp.zeros_like(t0, jnp.int32),
                               jnp.ones_like(t1, jnp.int32)], axis=-1)
        perm0 = jax.lax.broadcasted_iota(jnp.int32, t_evt.shape,
                                         t_evt.ndim - 1)
        t_sorted, _, perm = jax.lax.sort((t_evt, tie, perm0), dimension=-1,
                                         num_keys=2, is_stable=True)
        perm = jax.lax.stop_gradient(perm)

        # membership of every leaf just after every event time
        # (B, 2L, L): t0 <= t < t1
        ts = t_sorted[..., :, None]
        inside = (t0[..., None, :] <= ts) & (ts < t1[..., None, :])
        root = tape_bits(plan, inside)                           # (B, 2L)
        root_prev = jnp.pad(root[..., :-1],
                            [(0, 0)] * (root.ndim - 1) + [(1, 0)],
                            constant_values=False)
        crossing = root != root_prev

        trigger = crossing & (t_sorted >= EPS)
        any_trigger = jnp.any(trigger, axis=-1)
        idx = jax.lax.stop_gradient(jnp.argmax(trigger, axis=-1))

        take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
        t_hit = take(t_sorted)
        escaped = t_hit >= MAX_VALUE
        hit = any_trigger & ~escaped
        entering = take(root)          # up-transition ⇒ now inside

        evt_idx = take(perm)           # pre-sort event index: leaf + side
        leaf_idx = evt_idx % L
        n_all = jnp.concatenate([n0, n1], axis=-2)               # (B, 2L, 3)
        n_evt = jnp.take_along_axis(
            n_all, evt_idx[..., None, None], axis=-2)[..., 0, :]
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
