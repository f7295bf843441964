"""KDBush traversal order — the reference's child-enumeration order,
derived as a STATIC per-level rank (VERDICT r2 "What's missing #2").

The reference's getChildren / getLeaves enumerate a cluster's children in
the order `tree.within(x, y, r)` yields them
(packages/arrow-supercluster/src/arrow-cluster-engine.ts:291-302, leaves
DFS :312-348), where `tree` is a KDBush over the level array
(`_createTree`, :418-426 — nodeSize 64, Float32Array coords, items added
in level order).  KDBush is public (mourner/kdbush v4, ISC):

* `finish()` kd-sorts the (ids, coords) arrays: recursive median
  partition by Floyd–Rivest select, alternating x/y axes, recursion
  stopping at blocks <= nodeSize (block interiors keep whatever order
  the parent selects left them in — NOT insertion order);
* `within()` walks that array with an explicit stack, for each internal
  node visiting the MIDDLE item, then the RIGHT half, then the LEFT half
  (the left half is pushed first, so LIFO pops right first), and
  scanning <= nodeSize blocks linearly left→right.

Key property (asserted in tests/test_kdbush_order.py): pruning only ever
skips subtrees that contain no in-ball items, so the RELATIVE order of
the items a query returns never depends on the query — it is the fixed
mid-right-left traversal rank of the kd-sorted array.  That makes the
reference's within() order expressible as one static per-item column:

    visit_rank[item] = traversal_rank[ position of item after kd-sort ]

which the greedy engine stores as `pos` (operators/greedy.py) so that
`ORDER BY pos` reproduces the reference's child order and DFS page
boundaries at ANY level size (for levels <= nodeSize the sort is a no-op
and the rank is insertion order — the behavior rounds 1-2 already had).

Pure numpy/Python, driver/kernel-side only: ranks are computed inside
the same sequential exact-parity kernel that builds the level arrays
(greedy `mode="exact"` — the documented single-task parity oracle, not
the 100 TB path; grid/radius/cc modes are the production engines).
"""

from __future__ import annotations

import math

import numpy as np


def _swap(ids: np.ndarray, coords: np.ndarray, i: int, j: int) -> None:
    ids[i], ids[j] = ids[j], ids[i]
    coords[2 * i], coords[2 * j] = coords[2 * j], coords[2 * i]
    coords[2 * i + 1], coords[2 * j + 1] = coords[2 * j + 1], coords[2 * i + 1]


def _select(
    ids: np.ndarray, coords: np.ndarray, k: int, left: int, right: int, axis: int
) -> None:
    """Floyd–Rivest select, transcribed from kdbush v4 (public, ISC):
    partially sorts [left..right] so coords[2k+axis] is the k-th value;
    the EXACT swap sequence matters — it determines block-interior order."""
    while right > left:
        if right - left > 600:
            n = right - left + 1
            m = k - left + 1
            z = math.log(n)
            s = 0.5 * math.exp(2 * z / 3)
            sd = 0.5 * math.sqrt(z * s * (n - s) / n) * (-1 if m - n / 2 < 0 else 1)
            new_left = max(left, int(math.floor(k - m * s / n + sd)))
            new_right = min(right, int(math.floor(k + (n - m) * s / n + sd)))
            _select(ids, coords, k, new_left, new_right, axis)
        t = coords[2 * k + axis]
        i = left
        j = right
        _swap(ids, coords, left, k)
        if coords[2 * right + axis] > t:
            _swap(ids, coords, left, right)
        while i < j:
            _swap(ids, coords, i, j)
            i += 1
            j -= 1
            while coords[2 * i + axis] < t:
                i += 1
            while coords[2 * j + axis] > t:
                j -= 1
        if coords[2 * left + axis] == t:
            _swap(ids, coords, left, j)
        else:
            j += 1
            _swap(ids, coords, j, right)
        if j <= k:
            left = j + 1
        if k <= j:
            right = j - 1


def _sort_kd(
    ids: np.ndarray, coords: np.ndarray, node_size: int, left: int, right: int, axis: int
) -> None:
    if right - left <= node_size:
        return
    m = (left + right) >> 1
    _select(ids, coords, m, left, right, axis)
    _sort_kd(ids, coords, node_size, left, m - 1, 1 - axis)
    _sort_kd(ids, coords, node_size, m + 1, right, 1 - axis)


def kd_sort(x, y, node_size: int = 64) -> np.ndarray:
    """ids array after KDBush finish(): ids[p] = insertion index of the
    item at kd-array position p.  Coords are compared as float32 — the
    reference's trees store Float32Array (arrow-cluster-engine.ts:420)."""
    x32 = np.asarray(x, dtype=np.float32)
    y32 = np.asarray(y, dtype=np.float32)
    n = len(x32)
    ids = np.arange(n, dtype=np.int64)
    coords = np.empty(2 * n, dtype=np.float32)
    coords[0::2] = x32
    coords[1::2] = y32
    if n > 0:
        _sort_kd(ids, coords, node_size, 0, n - 1, 0)
    return ids


def traversal_rank(n: int, node_size: int = 64) -> np.ndarray:
    """rank[p] = visit position of kd-array slot p under within()'s
    traversal: middle item, then right half, then left half (LIFO stack —
    left pushed first), linear scan inside <= node_size blocks.  Depends
    only on n, never on coordinates or the query."""
    rank = np.empty(n, dtype=np.int64)
    ctr = 0
    if n == 0:
        return rank
    stack = [(0, n - 1, 0)]
    while stack:
        left, right, axis = stack.pop()
        if right - left <= node_size:
            for p in range(left, right + 1):
                rank[p] = ctr
                ctr += 1
            continue
        m = (left + right) >> 1
        rank[m] = ctr
        ctr += 1
        stack.append((left, m - 1, 1 - axis))
        stack.append((m + 1, right, 1 - axis))
    return rank


def kdbush_visit_rank(x, y, node_size: int = 64) -> np.ndarray:
    """visit_rank[i] = position at which insertion-index i appears in any
    within() result that includes it — the reference's child order as a
    static column.  Identity (insertion order) whenever n <= node_size."""
    n = len(x)
    if n <= node_size:
        return np.arange(n, dtype=np.int64)
    ids = kd_sort(x, y, node_size)
    ranks = traversal_rank(n, node_size)
    out = np.empty(n, dtype=np.int64)
    out[ids] = ranks
    return out


def within_order(x, y, qx: float, qy: float, r: float, node_size: int = 64) -> np.ndarray:
    """Full simulation of KDBush.within() INCLUDING pruning, returning
    insertion indices in traversal order.  Test oracle only — used to
    assert the static-rank property (result order == in-ball items sorted
    by kdbush_visit_rank) on randomized inputs."""
    x32 = np.asarray(x, dtype=np.float32)
    y32 = np.asarray(y, dtype=np.float32)
    n = len(x32)
    ids = kd_sort(x32, y32, node_size)
    coords = np.empty(2 * n, dtype=np.float32)
    coords[0::2] = x32[ids]
    coords[1::2] = y32[ids]
    result = []
    r2 = r * r
    if n == 0:
        return np.empty(0, dtype=np.int64)

    def sq_dist(p: int) -> float:
        dx = float(coords[2 * p]) - qx
        dy = float(coords[2 * p + 1]) - qy
        return dx * dx + dy * dy

    stack = [(0, n - 1, 0)]
    while stack:
        left, right, axis = stack.pop()
        if right - left <= node_size:
            for p in range(left, right + 1):
                if sq_dist(p) <= r2:
                    result.append(ids[p])
            continue
        m = (left + right) >> 1
        if sq_dist(m) <= r2:
            result.append(ids[m])
        v = float(coords[2 * m + axis])
        q_axis = qx if axis == 0 else qy
        if q_axis - r <= v:
            stack.append((left, m - 1, 1 - axis))
        if q_axis + r >= v:
            stack.append((m + 1, right, 1 - axis))
    return np.asarray(result, dtype=np.int64)
