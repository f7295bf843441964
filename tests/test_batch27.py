"""Batch-27 tests: Q5 plan gates (broadcast dims, pushed date filter),
argmin single-pass plan + bound check, KDE mass conservation."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.points import derived_points


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_plan_broadcasts_dims_and_pushes_date(spark, sf_dir):
    df = REGISTRY["q_tpch_q5"].spark(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    # the order-date range reaches the parquet scan (Spark 4 reports scan
    # predicates under DataFilters)
    assert "DataFilters: [isnotnull(o_orderdate" in plan
    rows = df.collect()
    assert rows and all(r.revenue > 0 for r in rows)


def test_min_cost_supplier_single_pass_argmin(spark, sf_dir):
    df = REGISTRY["q_min_cost_supplier"].spark(spark, sf_dir)
    # decorrelated form: no window operator anywhere in the plan
    assert "Window" not in _plan(df)
    best = {r.partkey: (r.best_price, r.suppkey) for r in df.collect()}
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    priced = l.select(
        "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("up"),
    ).collect()
    seen_min = {}
    for r in priced:
        cur = seen_min.get(r.l_partkey)
        cand = (r.up, r.l_suppkey)
        if cur is None or cand < cur:
            seen_min[r.l_partkey] = cand
    assert best == seen_min


def test_kde_mass_conservation(spark, sf_dir):
    rows = REGISTRY["q_kde_heatmap"].spark(spark, sf_dir).collect()
    n_pts = (
        derived_points(spark, sf_dir).filter(F.col("lng").isNotNull()).count()
    )
    assert sum(r.n_contrib for r in rows) == 9 * n_pts
    for r in rows:
        assert 0.0 < r.density <= r.n_contrib + 1e-9
    # total mass is below n_pts (truncated kernel, weights < 1 summed over 9)
    total = sum(r.density for r in rows)
    assert 0 < total < 9 * n_pts
