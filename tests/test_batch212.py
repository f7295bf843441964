"""Batch-212 tests: numpy/networkx-free replays of the graph metrics on
the exact kNN graph re-derived from raw embeddings."""

import numpy as np


def _knn(spark, sf_dir, k):
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = [r.vec_id for r in rows]
    V = np.array([[float(x) for x in r.embedding] for r in rows])
    n = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    S = np.round(n @ n.T, 6)
    knn = {}
    for i, q in enumerate(ids):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-S[i, j], ids[j]),
        )[:k]
        knn[q] = [ids[j] for j in order]
    return knn


def test_reciprocity_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext217 import _EC_K

    knn = _knn(spark, sf_dir, _EC_K)
    edges = {(s, d) for s, ds in knn.items() for d in ds}
    mutual = sum(1 for (s, d) in edges if (d, s) in edges)
    row = REGISTRY["q_reciprocity"].spark(spark, sf_dir).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_mutual == mutual
    assert row.reciprocity == round(mutual / len(edges), 6)


def test_transitivity_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext217 import _EC_K

    knn = _knn(spark, sf_dir, _EC_K)
    edges = {(s, d) for s, ds in knn.items() for d in ds}
    und = {(min(s, d), max(s, d)) for (s, d) in edges if (d, s) in edges}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # each triangle is counted once per of its 3 edges
    tri_total = sum(len(adj[u] & adj[v]) for u, v in und) // 3
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    row = REGISTRY["q_transitivity"].spark(spark, sf_dir).collect()[0]
    assert row.n_nodes == len(adj)
    assert row.n_edges == len(und)
    assert row.n_triangles == tri_total
    assert row.n_wedges == wedges
    want = round(3.0 * tri_total / wedges, 6) if wedges else 0.0
    assert row.transitivity == want


def test_eigenvector_centrality_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext217 import (
        _EC_ITERS,
        _EC_K,
    )

    knn = _knn(spark, sf_dir, _EC_K)
    edges = {(s, d) for s, ds in knn.items() for d in ds}
    und = {(s, d) for (s, d) in edges if (d, s) in edges}  # both directions
    ids = sorted(knn)
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for s, d in und:
        A[idx[s], idx[d]] = 1.0
    x = np.ones(len(ids))
    for _ in range(_EC_ITERS):
        y = A @ x
        nrm = float(np.sqrt((y * y).sum()))
        x = y / nrm if nrm > 0 else np.zeros_like(y)
    got = {
        r.vec_id: r.eigencentrality
        for r in REGISTRY["q_eigenvector_centrality"].spark(
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(ids)
    for v in ids:
        assert abs(got[v] - x[idx[v]]) < 1e-5, v
    # unit norm (up to isolated-node zeros) and non-negativity
    nrm = sum(val * val for val in got.values())
    assert abs(nrm - 1.0) < 1e-3
    assert all(val >= 0 for val in got.values())
