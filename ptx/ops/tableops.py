"""Table-lookup primitives with TPU-friendly transposes.

``table[idx]`` is a row gather; XLA transposes it to a scatter-add into
the table — and scatters serialize on TPU.  For the small parameter
tables this framework gathers from on every bounce (material constant
rows, per-material ior, packed leaf-geometry rows: tens to hundreds of
rows), the backward ablation (tools/bwd_ablate.py, round 2) showed those
scatter transposes dominating the whole backward pass: 118 of 186 ms per
bench chunk.

:func:`table_lookup` keeps the cheap gather forward but hand-writes the
backward as ``one_hot(idx)ᵀ @ ct`` — a dense (R, B) × (B, P) contraction
the MXU eats at roofline instead of a serialized scatter.  Only suitable
for SMALL row counts (the one-hot is materialized as (B, R) — keep
R ≲ 1k); large tables (texture images) keep the scatter transpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def table_lookup(table, idx):
    """``table[idx]`` for a (R, ...) table and integer ``idx`` of any
    shape; gradient w.r.t. ``table`` accumulates via MXU matmul."""
    return table[idx]


def _fwd(table, idx):
    return table[idx], (table.shape, idx)


def _bwd(res, ct):
    shape, idx = res
    R = shape[0]
    payload = 1
    for s in shape[1:]:
        payload *= s
    idx_flat = idx.reshape(-1)
    ct_flat = ct.reshape(idx_flat.shape[0], payload)
    oh = jax.nn.one_hot(idx_flat, R, dtype=ct_flat.dtype)      # (B, R)
    d_table = jax.lax.dot_general(
        oh, ct_flat, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (R, P)
    return d_table.reshape(shape), None


table_lookup.defvjp(_fwd, _bwd)
