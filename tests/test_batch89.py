"""Batch-89 tests: RBO properties, MMR greedy oracle, DTW DP oracle."""

import numpy as np

from pyspark.sql import functions as F


def test_rbo_properties(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext94 import q_rbo

    rows = sorted(q_rbo(spark, sf_dir).collect(), key=lambda r: r.d)
    assert len(rows) == 10
    prev_overlap, prev_rbo = -1, -1.0
    for r in rows:
        assert 0.0 <= r.agreement <= 1.0 + 1e-9
        assert r.n_overlap >= prev_overlap       # overlap can't shrink
        assert r.rbo_cum >= prev_rbo - 1e-9      # cumulative sum grows
        assert r.n_overlap <= r.d
        prev_overlap, prev_rbo = r.n_overlap, r.rbo_cum
    assert rows[-1].rbo_cum <= 1.0 + 1e-9


def test_mmr_matches_python_greedy(spark, sf_dir):
    """Recompute the greedy MMR selection independently for every query
    from the same candidate frame."""
    from arrow_supercluster_spark.operators.similarity import cosine_topk
    from arrow_supercluster_spark.plans.registry_ext94 import (
        _MMR_CAND,
        _MMR_K,
        _MMR_LAMBDA,
        q_mmr_rerank,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    cand = (
        cosine_topk(corpus, queries, k=_MMR_CAND)
        .join(
            emb.select("vec_id", F.col("embedding").alias("cv")), "vec_id"
        )
        .collect()
    )
    by_q = {}
    for r in cand:
        by_q.setdefault(r.q_id, []).append(r)
    want = {}
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: (-r.cos, r.vec_id))
        vecs = np.array([r.cv for r in rs], dtype=float)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        chosen = []
        for _ in range(min(_MMR_K, len(rs))):
            best, best_s = None, -np.inf
            # r7 argmax discipline (matches kernel + SQL twin):
            # round-9 score, first strict maximum in candidate order
            for i in range(len(rs)):
                if i in chosen:
                    continue
                div = (
                    max(float(vecs[i] @ vecs[j]) for j in chosen)
                    if chosen
                    else 0.0
                )
                s = round(
                    _MMR_LAMBDA * rs[i].cos - (1 - _MMR_LAMBDA) * div, 9
                )
                if s > best_s:
                    best, best_s = i, s
            chosen.append(best)
        want[q] = [rs[i].vec_id for i in chosen]
    got = {}
    for r in q_mmr_rerank(spark, sf_dir).collect():
        got.setdefault(r.q_id, {})[r.sel_rank] = r.vec_id
    got = {q: [m[k] for k in sorted(m)] for q, m in got.items()}
    assert got == want
    # rank 1 is always the raw top-cos candidate (no diversity penalty
    # on the first pick)
    for q, rs in by_q.items():
        top = min(rs, key=lambda r: (-r.cos, r.vec_id))
        assert want[q][0] == top.vec_id


def test_dtw_matches_independent_dp(spark, sf_dir):
    """Recompute one pair's DTW with an independently-written DP over
    the same z-normalized daily curves."""
    from arrow_supercluster_spark.plans.registry_ext94 import q_dtw_daily
    from arrow_supercluster_spark.sources.tables import read_events

    got = {(r.a, r.b): r.dtw_dist for r in q_dtw_daily(spark, sf_dir).collect()}
    assert got, "pair frame must be non-empty"
    ev = read_events(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    curves = {}
    for r in daily:
        curves.setdefault(r.event_type, []).append((r.day, r["count"]))
    for t in curves:
        curves[t] = np.array(
            [n for _, n in sorted(curves[t])], dtype=float
        )

    def znorm(x):
        return (x - x.mean()) / (x.std() or 1.0)

    def dtw(x, y):
        x, y = znorm(x), znorm(y)
        n, m = len(x), len(y)
        D = np.full((n + 1, m + 1), np.inf)
        D[0, 0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                D[i, j] = abs(x[i - 1] - y[j - 1]) + min(
                    D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
                )
        return round(float(D[n, m]), 6)

    for (a, b), d in got.items():
        assert abs(d - dtw(curves[a], curves[b])) < 1e-6, (a, b)
    # self-similarity sanity: identical curves → 0
    any_t = next(iter(curves))
    assert dtw(curves[any_t], curves[any_t]) == 0.0
