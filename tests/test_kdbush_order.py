"""KDBush-order model tests (functions/kdbush_order.py):

1. kd-sort structural invariants: every internal node's median splits its
   range by the axis coordinate (left <= median <= right), blocks are
   <= nodeSize, and the ids are a permutation.
2. The static-rank theorem the whole design rests on: for ANY query ball,
   within()'s result order (full pruning simulation) equals the in-ball
   items sorted by the query-INDEPENDENT visit rank.
3. Levels <= nodeSize keep insertion order (rounds 1-2 behavior).
4. Determinism across calls.
"""

import numpy as np

from arrow_supercluster_spark.functions.kdbush_order import (
    kd_sort,
    kdbush_visit_rank,
    traversal_rank,
    within_order,
)


def _rand(n, seed):
    rng = np.random.RandomState(seed)
    return (
        rng.uniform(0, 1, n).astype(np.float32),
        rng.uniform(0, 1, n).astype(np.float32),
    )


def _check_kd_invariant(x, y, ids, left, right, axis, node_size=64):
    if right - left <= node_size:
        return
    m = (left + right) >> 1
    coords = (x, y)[axis]
    med = coords[ids[m]]
    assert (coords[ids[left:m]] <= med).all()
    assert (coords[ids[m + 1 : right + 1]] >= med).all()
    _check_kd_invariant(x, y, ids, left, m - 1, 1 - axis, node_size)
    _check_kd_invariant(x, y, ids, m + 1, right, 1 - axis, node_size)


def test_kd_sort_partition_invariant():
    for n in (65, 200, 1000):
        x, y = _rand(n, seed=n)
        ids = kd_sort(x, y)
        assert sorted(ids.tolist()) == list(range(n))
        _check_kd_invariant(x, y, ids, 0, n - 1, 0)


def test_traversal_rank_is_permutation():
    for n in (0, 1, 64, 65, 200, 1000):
        r = traversal_rank(n)
        assert sorted(r.tolist()) == list(range(n))


def test_small_levels_keep_insertion_order():
    x, y = _rand(64, seed=7)
    assert kdbush_visit_rank(x, y).tolist() == list(range(64))


def test_static_rank_matches_within_order():
    """The theorem: pruning never reorders surviving items, so
    within()-order == sort-by-static-rank for every query."""
    for n in (80, 300, 777):
        x, y = _rand(n, seed=n * 3 + 1)
        rank = kdbush_visit_rank(x, y)
        rng = np.random.RandomState(n)
        for _ in range(25):
            qx, qy = rng.uniform(0, 1, 2)
            r = rng.uniform(0.01, 0.5)
            got = within_order(x, y, float(qx), float(qy), float(r))
            want = sorted(got.tolist(), key=lambda i: rank[i])
            assert got.tolist() == want, (n, qx, qy, r)


def test_visit_rank_deterministic():
    x, y = _rand(500, seed=11)
    a = kdbush_visit_rank(x, y)
    b = kdbush_visit_rank(x, y)
    assert (a == b).all()
