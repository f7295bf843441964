"""Batch-85 tests: Q21-shape decorrelation, CUPED variance reduction,
NDCG ranking eval."""

import tempfile

from pyspark.sql import functions as F


def test_late_supplier_crafted_scenario(spark):
    """Hand-built warehouse: order 1 has two suppliers, only supplier 10
    late → counted. Order 2 has two late suppliers → neither counted.
    Order 3 single-supplier late → not counted (no other supplier).
    Order 4: supplier 10 on time → not counted."""
    from arrow_supercluster_spark.plans.registry_ext90 import q_late_supplier

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, 10, "2024-03-01 00:00:00", 100.0),
                (1, 11, "2023-11-10 00:00:00", 100.0),
                (2, 10, "2024-02-01 00:00:00", 100.0),
                (2, 11, "2024-02-02 00:00:00", 100.0),
                (3, 12, "2024-03-01 00:00:00", 100.0),
                (4, 10, "2023-11-05 00:00:00", 100.0),
                (4, 12, "2023-11-06 00:00:00", 100.0),
            ],
            "l_orderkey long, l_suppkey long, ship string, x double",
        ).select(
            "l_orderkey", "l_suppkey",
            F.to_timestamp("ship").alias("l_shipdate"),
        ).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            [(i, "2023-11-01 00:00:00") for i in (1, 2, 3, 4)],
            "o_orderkey long, od string",
        ).select(
            "o_orderkey", F.to_timestamp("od").alias("o_orderdate")
        ).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame(
            [(10, "Supp#10"), (11, "Supp#11"), (12, "Supp#12")],
            "s_suppkey long, s_name string",
        ).write.parquet(f"{d}/supplier.parquet")
        got = {
            r.s_suppkey: r.numwait
            for r in q_late_supplier(spark, d).collect()
        }
        assert got == {10: 1}


def test_cuped_reduces_variance_and_preserves_means(spark, sf_dir):
    """θ minimizes POOLED var(y - θx), so pooled variance reduction is
    the mathematical guarantee (var(y) - cov²/var(x) ≤ var(y)); per-arm
    variance can tick up within noise when pre/post correlation ≈ 0, so
    the pooled check recomputes from the raw frame."""
    import pandas as pd

    from arrow_supercluster_spark.plans.registry_ext90 import q_cuped
    from arrow_supercluster_spark.sources.tables import read_events

    rows = q_cuped(spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        # adjustment is mean-preserving up to the arm-vs-pool covariate
        # imbalance, which is small for a parity split
        assert abs(r.mean_adj - r.mean_post) < 0.2 * abs(r.mean_post) + 50

    # pooled guarantee, recomputed independently with pandas
    ev = read_events(spark, sf_dir).toPandas()
    mid = ev.ts.min().value + (ev.ts.max().value - ev.ts.min().value) // 2
    ev["pre"] = ev.value.where(ev.ts.astype("int64") < mid, 0.0)
    ev["post"] = ev.value.where(ev.ts.astype("int64") >= mid, 0.0)
    u = ev.groupby("user_id")[["pre", "post"]].sum()
    theta = u.pre.cov(u.post, ddof=0) / u.pre.var(ddof=0)
    adj = u.post - theta * (u.pre - u.pre.mean())
    assert adj.var(ddof=0) <= u.post.var(ddof=0) + 1e-9
    # n conservation across arms
    assert sum(r.n_users for r in rows) == len(u)


def test_ndcg_bounds_at_sf(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext90 import q_ndcg

    rows = q_ndcg(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        assert r.dcg <= r.idcg + 1e-9


def test_ndcg_perfect_retrieval_is_one(spark):
    """Crafted embeddings where the query's label-mates are exactly its
    nearest neighbors → NDCG@10 = 1; plus an all-irrelevant query → 0."""
    from arrow_supercluster_spark.plans.registry_ext90 import q_ndcg

    rows = []
    # query 0, label 1: corpus vectors 10..14 label 1 near (1,0),
    # 15..19 label 2 near (0,1)
    rows.append((0, [1.0, 0.0], 1))
    # query 1, label 9: nothing relevant in the corpus
    rows.append((1, [0.5, 0.5], 9))
    for i in range(10, 15):
        rows.append((i, [1.0, 0.001 * i], 1))
    for i in range(15, 20):
        rows.append((i, [0.001 * i, 1.0], 2))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{d}/embeddings.parquet")
        got = {r.q_id: r for r in q_ndcg(spark, d).collect()}
        assert got[0].ndcg == 1.0 and got[0].n_rel == 5
        assert got[1].ndcg == 0.0 and got[1].n_rel == 0 and got[1].idcg == 0.0
