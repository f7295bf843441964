"""Batch-200 tests: numpy brute-force kNN replays of hubness / TwoNN /
LID, plus structural invariants (mean in-degree = k, ID within the
ambient bound, LID positivity)."""

import math

import numpy as np


def _knn(spark, sf_dir, k):
    """Brute-force round-6 cosine kNN with (cos desc, id) ties —
    the same construction the queries state."""
    from arrow_supercluster_spark.plans.registry_ext import _emb

    rows = _emb(spark, sf_dir).select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)
    order = np.argsort(ids)
    nbrs = {}
    for i, vid in enumerate(ids):
        cand = [
            (-S[i, j], ids[j]) for j in range(len(ids)) if j != i
        ]
        cand.sort()
        nbrs[vid] = [(-c, d) for c, d in cand[:k]]
    return ids, nbrs


def test_hubness_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext205 import (
        _HG_K,
        q_hubness,
    )

    ids, nbrs = _knn(spark, sf_dir, _HG_K)
    indeg = {v: 0 for v in ids}
    for src, lst in nbrs.items():
        for _, dst in lst:
            indeg[dst] += 1
    degs = np.array(list(indeg.values()), dtype=float)
    n = len(degs)
    m1 = degs.mean()
    m2 = (degs**2).mean() - m1**2
    m3 = (degs**3).mean() - 3 * m1 * (degs**2).mean() + 2 * m1**3
    skew = m3 / m2**1.5
    [r] = q_hubness(spark, sf_dir).collect()
    assert (r.n, r.k) == (n, _HG_K)
    assert abs(r.indeg_skewness - round(skew, 6)) < 1e-6
    assert r.max_indegree == int(degs.max())
    assert r.n_antihubs == int((degs == 0).sum())
    # mean in-degree is exactly k (every node emits k edges)
    assert abs(m1 - _HG_K) < 1e-12


def test_twonn_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext205 import (
        _HG_K,
        q_twonn_dim,
    )

    ids, nbrs = _knn(spark, sf_dir, _HG_K)
    lms, excluded = [], 0
    for src, lst in nbrs.items():
        d1 = 1.0 - lst[0][0]
        d2 = 1.0 - lst[1][0]
        if d1 > 0:
            lms.append(math.log(d2 / d1))
        else:
            excluded += 1
    id_hat = len(lms) / sum(lms)
    [r] = q_twonn_dim(spark, sf_dir).collect()
    assert (r.n_used, r.n_excluded) == (len(lms), excluded)
    assert abs(r.id_hat - round(id_hat, 4)) < 1e-3
    # intrinsic dim of a 64-dim gaussian-ish cloud: positive, <= ambient
    assert 0 < r.id_hat <= 64 + 1


def test_lid_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext205 import (
        _HG_K,
        q_lid,
    )

    ids, nbrs = _knn(spark, sf_dir, _HG_K)
    lids, excluded = [], 0
    for src, lst in nbrs.items():
        ds = [1.0 - c for c, _ in lst]
        dk = ds[-1]
        if min(ds) <= 0:
            excluded += 1
            continue
        s = sum(math.log(d / dk) for d in ds)
        if s >= 0:
            excluded += 1
            continue
        lids.append(-_HG_K / s)
    [r] = q_lid(spark, sf_dir).collect()
    assert (r.n_used, r.n_excluded) == (len(lids), excluded)
    assert abs(r.mean_lid - round(sum(lids) / len(lids), 4)) < 1e-3
    assert abs(r.min_lid - round(min(lids), 4)) < 1e-3
    assert abs(r.max_lid - round(max(lids), 4)) < 1e-3
    assert r.min_lid > 0
