"""Batch-211 tests: python replay of MRR / NDCG@k / P-R@k on the exact
cosine ranking re-derived from raw embeddings, plus cross-metric
consistency invariants."""

import math

import numpy as np


def _rankings(spark, sf_dir, k):
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in rows])
    labels = {r.vec_id: r.label for r in rows}
    V = np.array([[float(x) for x in r.embedding] for r in rows])
    n = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    S = np.round(n @ n.T, 6)
    out = {}
    for i, q in enumerate(ids):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-S[i, j], ids[j]),
        )[:k]
        out[q] = [int(labels[ids[j]] == labels[q]) for j in order]
    n_rel = {
        q: sum(1 for o in ids if o != q and labels[o] == labels[q])
        for q in ids
    }
    return out, n_rel


def test_retrieval_metrics_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext162 import _MAP_K

    rel, n_rel = _rankings(spark, sf_dir, _MAP_K)

    mrr_row = REGISTRY["q_mrr"].spark(spark, sf_dir).collect()[0]
    want_mrr = sum(
        (1.0 / (r.index(1) + 1)) if 1 in r else 0.0 for r in rel.values()
    ) / len(rel)
    assert mrr_row.n_queries == len(rel)
    assert abs(mrr_row.mrr_at_k - want_mrr) < 1e-5

    ndcg_row = REGISTRY["q_ndcg_at_k"].spark(spark, sf_dir).collect()[0]
    def dcg(bits):
        return sum(b / math.log2(i + 2) for i, b in enumerate(bits))
    want_ndcg = 0.0
    for q, bits in rel.items():
        ideal = dcg([1] * min(n_rel[q], _MAP_K))
        want_ndcg += dcg(bits) / ideal if ideal > 0 else 0.0
    want_ndcg /= len(rel)
    assert abs(ndcg_row.ndcg_at_k - want_ndcg) < 1e-5

    pr_row = REGISTRY["q_precision_recall_at_k"].spark(
        spark, sf_dir
    ).collect()[0]
    want_p = sum(sum(r) / len(r) for r in rel.values()) / len(rel)
    want_r = sum(
        (sum(r) / min(n_rel[q], _MAP_K)) if n_rel[q] > 0 else 0.0
        for q, r in rel.items()
    ) / len(rel)
    want_h = sum(1.0 for r in rel.values() if sum(r) > 0) / len(rel)
    assert abs(pr_row.precision_at_k - want_p) < 1e-5
    assert abs(pr_row.recall_at_k - want_r) < 1e-5
    assert abs(pr_row.hit_rate - want_h) < 1e-5

    # cross-metric invariants: hit_rate ≥ precision; MRR ≥ frac_top1;
    # all in [0, 1]
    assert pr_row.hit_rate >= pr_row.precision_at_k - 1e-9
    assert mrr_row.mrr_at_k >= mrr_row.frac_top1 - 1e-9
    for v in (
        mrr_row.mrr_at_k, ndcg_row.ndcg_at_k, pr_row.precision_at_k,
        pr_row.recall_at_k, pr_row.hit_rate,
    ):
        assert -1e-9 <= v <= 1.0 + 1e-9
