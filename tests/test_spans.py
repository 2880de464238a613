"""Span-algebra property tests vs a brute-force 1-D set oracle.

Strategy per SURVEY §4: evaluate union/intersection/difference on random
synthetic interval lists and compare membership against dense point
sampling of the boolean combination.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ptx.geom import spans


def make_spanlist(intervals, mat=1):
    """Build a (1, K) SpanList from a python list of disjoint sorted
    (t0, t1) tuples; normals encode the boundary identity for checking."""
    k = max(len(intervals), 1)
    t0 = np.full((1, k), 3e20, np.float32)
    t1 = np.full((1, k), 3e20, np.float32)
    n0 = np.zeros((1, k, 3), np.float32)
    n1 = np.zeros((1, k, 3), np.float32)
    m0 = np.zeros((1, k), np.int32)
    m1 = np.zeros((1, k), np.int32)
    valid = np.zeros((1, k), bool)
    for i, (a, b) in enumerate(intervals):
        t0[0, i], t1[0, i] = a, b
        n0[0, i] = (1, 0, 0)
        n1[0, i] = (-1, 0, 0)
        m0[0, i] = m1[0, i] = mat
        valid[0, i] = True
    return spans.SpanList(jnp.array(t0), jnp.array(n0), jnp.array(m0),
                          jnp.array(t1), jnp.array(n1), jnp.array(m1),
                          jnp.array(valid))


def spanlist_to_intervals(sl):
    t0 = np.asarray(sl.t0)[0]
    t1 = np.asarray(sl.t1)[0]
    v = np.asarray(sl.valid)[0]
    return sorted((a, b) for a, b, ok in zip(t0, t1, v) if ok)


def membership(intervals, xs):
    out = np.zeros_like(xs, bool)
    for a, b in intervals:
        out |= (xs > a) & (xs < b)   # open membership avoids boundary ties
    return out


def random_disjoint_intervals(rng, n, lo=-10, hi=10):
    pts = np.sort(rng.uniform(lo, hi, size=2 * n))
    return [(pts[2 * i], pts[2 * i + 1]) for i in range(n)]


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("op", ["union", "intersection", "difference"])
def test_binary_ops_match_oracle(seed, op):
    rng = np.random.default_rng(seed)
    ia = random_disjoint_intervals(rng, rng.integers(0, 5))
    ib = random_disjoint_intervals(rng, rng.integers(0, 5))
    a, b = make_spanlist(ia, mat=1), make_spanlist(ib, mat=2)
    if op == "union":
        got = spans.union(a, b)
        expect = lambda in_a, in_b: in_a | in_b
    elif op == "intersection":
        got = spans.intersection(a, b)
        expect = lambda in_a, in_b: in_a & in_b
    else:
        got = spans.difference(a, b)
        expect = lambda in_a, in_b: in_a & ~in_b
    xs = np.linspace(-11, 11, 4001)
    want = expect(membership(ia, xs), membership(ib, xs))
    have = membership(spanlist_to_intervals(got), xs)
    # tolerate disagreement only within eps of an endpoint
    endpoints = np.array([t for iv in (ia + ib) for t in iv] or [0.0])
    near_edge = np.min(np.abs(xs[:, None] - endpoints[None, :]), axis=1) < 1e-2
    assert np.array_equal(want[~near_edge], have[~near_edge])


@pytest.mark.parametrize("seed", range(6))
def test_nary_union_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    lists = [random_disjoint_intervals(rng, rng.integers(1, 4))
             for _ in range(4)]
    got = spans.union(*[make_spanlist(iv) for iv in lists])
    xs = np.linspace(-11, 11, 4001)
    want = np.zeros_like(xs, bool)
    for iv in lists:
        want |= membership(iv, xs)
    have = membership(spanlist_to_intervals(got), xs)
    endpoints = np.array([t for iv in lists for ab in iv for t in ab])
    near_edge = np.min(np.abs(xs[:, None] - endpoints[None, :]), axis=1) < 1e-2
    assert np.array_equal(want[~near_edge], have[~near_edge])


def test_union_coalesces_touching_spans():
    a = make_spanlist([(0.0, 2.0)], mat=1)
    b = make_spanlist([(2.0, 5.0)], mat=2)
    got = spans.union(a, b)
    assert spanlist_to_intervals(got) == [(0.0, 5.0)]
    # merged span keeps A's start payload and B's end payload
    # (union.cpp:117-124 extends A's end from B)
    v = np.asarray(got.valid)[0]
    idx = int(np.argmax(v))
    assert int(np.asarray(got.m0)[0, idx]) == 1
    assert int(np.asarray(got.m1)[0, idx]) == 2


def test_difference_cut_surface_takes_b_payload_negated():
    # A=[0,10] minus B=[3,5] -> [0,3] and [5,10]; cut boundaries carry B's
    # material with negated normals (span.h:100-112).
    a = make_spanlist([(0.0, 10.0)], mat=1)
    b = make_spanlist([(3.0, 5.0)], mat=2)
    got = spans.difference(a, b)
    assert spanlist_to_intervals(got) == [(0.0, 3.0), (5.0, 10.0)]
    t0 = np.asarray(got.t0)[0]
    order = np.argsort(t0)
    first, second = order[0], order[1]
    assert int(np.asarray(got.m1)[0, first]) == 2     # cut end: B's material
    assert np.allclose(np.asarray(got.n1)[0, first], (-1, 0, 0))  # -B.startNormal
    assert int(np.asarray(got.m0)[0, second]) == 2    # cut start: B's material
    assert np.allclose(np.asarray(got.n0)[0, second], (1, 0, 0))  # -B.endNormal


def test_difference_a_starts_inside_b():
    # The reference mishandles this case (difference.cpp:126-130); we
    # implement correct interval subtraction: [2,10] - [1,5] = [5,10].
    a = make_spanlist([(2.0, 10.0)], mat=1)
    b = make_spanlist([(1.0, 5.0)], mat=2)
    got = spans.difference(a, b)
    assert spanlist_to_intervals(got) == [(5.0, 10.0)]
