"""Batch-24 tests: power iteration vs numpy replica, A/B test math vs
pure Python, Gini vs direct formula."""

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_power_iteration_matches_numpy_replica(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    X = np.array([r.embedding for r in emb], dtype=np.float64)
    v = np.full(64, 1.0 / np.sqrt(64.0))
    for _ in range(3):
        s = X @ v
        w = np.round(X.T @ s, 6)
        nrm = np.round(np.sqrt((w * w).sum()), 6)
        v = np.round(w / nrm, 6)
    got = {r.d: r.v for r in REGISTRY["q_power_iteration"].spark(spark, sf_dir).collect()}
    assert len(got) == 64
    for d in range(1, 65):
        assert abs(got[d] - v[d - 1]) <= 2e-6, (d, got[d], v[d - 1])
    # unit norm (within rounding)
    assert abs(sum(x * x for x in got.values()) - 1.0) < 1e-3
    # power-iteration invariant: the Rayleigh quotient vᵀGv must grow
    # every round (full convergence is NOT expected here — the synthetic
    # embeddings have a near-degenerate spectrum, λ1/λ2 ≈ 1.017)
    G = X.T @ X
    rq = []
    v2 = np.full(64, 1.0 / np.sqrt(64.0))
    rq.append(float(v2 @ G @ v2))
    for _ in range(3):
        s = X @ v2
        w = np.round(X.T @ s, 6)
        v2 = np.round(w / np.round(np.sqrt((w * w).sum()), 6), 6)
        rq.append(float(v2 @ G @ v2))
    assert all(b > a for a, b in zip(rq, rq[1:])), rq
    vv = np.array([got[d] for d in range(1, 65)])
    assert abs(float(vv @ G @ vv) - rq[-1]) / rq[-1] < 1e-4


def test_ab_test_math(spark, sf_dir):
    ev = read_events(spark, sf_dir).select("user_id", "event_type", "value").collect()
    conv = {}
    for r in ev:
        c = conv.setdefault(r.user_id, 0)
        if r.event_type == "purchase" and r.value is not None and r.value > 90:
            conv[r.user_id] = 1
    arms = {0: [0, 0], 1: [0, 0]}  # n, k
    for u, c in conv.items():
        arms[u % 2][0] += 1
        arms[u % 2][1] += c
    n0, k0 = arms[0]
    n1, k1 = arms[1]
    p0, p1 = k0 / n0, k1 / n1
    pool = (k0 + k1) / (n0 + n1)
    se = np.sqrt(pool * (1 - pool) * (1 / n0 + 1 / n1))
    row = REGISTRY["q_ab_test"].spark(spark, sf_dir).collect()[0]
    assert (row.n0, row.k0, row.n1, row.k1) == (n0, k0, n1, k1)
    assert abs(row.p0 - round(p0, 6)) < 1e-12
    if se > 0:
        assert abs(row.z - round((p1 - p0) / se, 6)) < 1e-9
        assert row.significant == (abs((p1 - p0) / se) > 1.96)


def test_gini_formula(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r.dimension: r.gini for r in REGISTRY["q_gini"].spark(spark, sf_dir).collect()}
    for dim in ("source", "lang"):
        counts = sorted(
            (r.c, r.k)
            for r in docs.groupBy(F.col(dim).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        xs = [c for c, _ in counts]
        n, tot = len(xs), sum(xs)
        g = (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * tot) / (n * tot)
        assert abs(got[dim] - round(g, 6)) < 1e-9
        assert 0.0 <= got[dim] < 1.0
