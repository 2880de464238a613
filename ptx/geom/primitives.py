"""Closed-form primitive → span-list kernels, batched over a ray wavefront.

Each kernel maps a batch of rays ``(origin, dir)`` with shape ``(..., 3)``
plus primitive parameters to a K=1 :class:`~ptx.geom.spans.SpanList`.
The reference equivalents are per-ray virtual iterators
(``/root/reference/src/sphere.cpp:21-81``, ``src/plane.cpp:23-89``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ptx.core.constants import EPS, MAX_VALUE
from ptx.core.linalg import dot, normalize
from ptx.geom.spans import SpanList, single


def sphere_spans(origin, direction, center, radius, mat_id) -> SpanList:
    """Ray/sphere quadratic: one span ``[t-, t+]`` with outward normals at
    both boundaries; a miss when the (quarter-)discriminant ``b² − ac`` is
    ``<= EPS`` — note the reference's tolerance is EPS, not 0
    (sphere.cpp:38-43), which also culls grazing hits.
    """
    oc = origin - center
    a = dot(direction, direction)
    b = dot(oc, direction)
    c = dot(oc, oc) - radius * radius
    disc = b * b - a * c
    valid = disc > EPS
    sq = jnp.sqrt(jnp.where(valid, disc, 1.0))
    safe_a = jnp.where(a == 0.0, 1.0, a)
    t0 = (-b - sq) / safe_a
    t1 = (-b + sq) / safe_a
    n0 = normalize(origin + t0[..., None] * direction - center)
    n1 = normalize(origin + t1[..., None] * direction - center)
    return single(t0, n0, mat_id, t1, n1, mat_id, valid & (a != 0.0))


def plane_spans(origin, direction, normal, d, mat_id) -> SpanList:
    """Half-space ``normal·x + d <= 0``: a half-infinite span clipped at the
    plane crossing, with the ``±MAX_VALUE`` sentinel on the open side
    (plane.cpp:35-62).  Case analysis (all float32):

    - |dir·n| < EPS² (parallel) or |t| >= MAX_VALUE:
        inside-boundary test |−d − o·n| < EPS² ⇒ full span [−MAX, MAX],
        else no span;
    - dir·n < 0 (entering): span [t, MAX_VALUE];
    - dir·n > 0 (exiting):  span [−MAX_VALUE, t].

    Both boundary normals are the (normalized) plane normal
    (plane.cpp:29-30).
    """
    n_unit = normalize(normal)
    divisor = dot(direction, normal)
    numerator = -d - dot(origin, normal)
    safe_div = jnp.where(jnp.abs(divisor) < EPS * EPS, 1.0, divisor)
    t = numerator / safe_div
    degenerate = (jnp.abs(divisor) < EPS * EPS) | (jnp.abs(t) >= MAX_VALUE)
    on_boundary = jnp.abs(numerator) < EPS * EPS
    entering = divisor < 0.0

    full = degenerate & on_boundary
    miss = degenerate & ~on_boundary

    t0 = jnp.where(full, -MAX_VALUE, jnp.where(entering, t, -MAX_VALUE))
    t1 = jnp.where(full, MAX_VALUE, jnp.where(entering, MAX_VALUE, t))
    nb = jnp.broadcast_to(n_unit, origin.shape)
    return single(t0, nb, mat_id, t1, nb, mat_id, ~miss)
