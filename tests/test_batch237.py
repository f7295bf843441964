"""Batch 237 replays — LATERAL, landmark betweenness, LDP, German tank
(R697–R700).  Algebraic/statistical invariants on top of the DuckDB
differential."""

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_lateral_topk_per_customer(spark, sf_dir):
    """<= 2 rows per customer, each customer's rows are its true top-2
    orders by (cents desc, orderkey)."""
    rows = REGISTRY["q_lateral_join"].spark(spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r.c_custkey, []).append((r.cents, r.o_orderkey))
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .collect()
    )
    truth = {}
    for o in orders:
        truth.setdefault(o.o_custkey, []).append((o.cents, o.o_orderkey))
    for ck, got in per.items():
        assert len(got) <= 2
        want = sorted(truth[ck], key=lambda t: (-t[0], t[1]))[:2]
        assert got == want


def test_betweenness_python_replay(spark, sf_dir):
    """Full numpy/dict replay of the 3-hop Brandes pass from the same
    32 hash-ranked landmarks — betweenness must match to 1e-4."""
    from arrow_supercluster_spark.plans.registry_ext235 import _wl_edges
    from arrow_supercluster_spark.plans.registry_ext237 import _BC_SRC, _P

    edges = _wl_edges(spark, sf_dir).collect()
    adj = {}
    for e in edges:
        adj.setdefault(e.src, set()).add(e.dst)
    srcs = sorted(adj, key=lambda u: ((48271 * u + 11) % _P, u))[:_BC_SRC]
    bc = {}
    for s in srcs:
        d1 = adj[s]
        sigma1 = {v: 1 for v in d1}
        sigma2, sigma3 = {}, {}
        for v in d1:
            for w in adj[v]:
                if w != s and w not in d1:
                    sigma2[w] = sigma2.get(w, 0) + 1
        for w in sigma2:
            for x in adj[w]:
                if x != s and x not in d1 and x not in sigma2:
                    sigma3[x] = sigma3.get(x, 0) + sigma2[w]
        delta2 = {}
        for w in sigma2:
            for x in adj[w]:
                if x in sigma3:
                    delta2[w] = delta2.get(w, 0.0) + sigma2[w] / sigma3[x]
        delta1 = {}
        for v in d1:
            for w in adj[v]:
                if w in sigma2:
                    delta1[v] = delta1.get(v, 0.0) + (
                        1.0 + delta2.get(w, 0.0)
                    ) / sigma2[w]
        for v, d in delta1.items():
            bc[v] = bc.get(v, 0.0) + d
        for w, d in delta2.items():
            bc[w] = bc.get(w, 0.0) + d
    rows = REGISTRY["q_betweenness_khop"].spark(spark, sf_dir).collect()
    got = {r.node: r.betweenness for r in rows}
    assert set(got) == set(bc)
    for v in bc:
        assert abs(got[v] - bc[v]) < 1e-4, (v, got[v], bc[v])


def test_ldp_debias_is_unbiased_algebra(spark, sf_dir):
    """The debias numerator must satisfy 20*c_t - n exactly, and the
    estimate must be within sampling noise of truth (loose 4*sqrt(n)
    band — the hash coin is deterministic, so this is a fixed fact)."""
    rows = REGISTRY["q_ldp_frequency"].spark(spark, sf_dir).collect()
    n = sum(r.true_count for r in rows)
    for r in rows:
        assert r.n_est_x15 == 20 * r.reported_count - n
        assert abs(r.n_est - r.true_count) <= 4 * np.sqrt(n) + 10


def test_german_tank_estimator(spark, sf_dir):
    r = REGISTRY["q_german_tank"].spark(spark, sf_dir).collect()[0]
    assert r.n_hat_times_k == r.m1 * (r.k + 1) - r.k
    assert r.m1 <= r.true_n
    # MVUE with k samples: relative error concentrates at ~1/k
    assert abs(r.n_hat - r.true_n) <= r.true_n * (3.0 / r.k) + 2
