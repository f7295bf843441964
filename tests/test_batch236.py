"""Batch 236 replays — TPC-H decorrelation shapes (R692–R696).
The DuckDB differential already proves the hand-decorrelated Spark
plans match the correlated-subquery SQL; here we pin the PLAN SHAPES
(the decorrelation artifacts: semi/anti joins, broadcasts) and a few
algebraic bounds."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def _plan(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    return df, df._jdf.queryExecution().executedPlan().toString()


def test_q4_uses_semi_join_and_bounds(spark, sf_dir):
    df, plan = _plan(spark, sf_dir, "q_tpch_q4")
    assert "LeftSemi" in plan
    rows = df.collect()
    n_window = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .count()
    )
    assert 0 < sum(r.order_count for r in rows) <= n_window


def test_q11_share_threshold(spark, sf_dir):
    """Every surviving part's value must exceed total/2000; the
    excluded remainder must not."""
    df, plan = _plan(spark, sf_dir, "q_tpch_q11")
    rows = df.collect()
    total = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("t")
        )
        .collect()[0]
        .t
    )
    for r in rows:
        assert r.value_cents * 2000 > total
    # descending by value, tie-broken by key
    vals = [(-r.value_cents, r.l_partkey) for r in rows]
    assert vals == sorted(vals)


def test_q15_all_rows_are_max(spark, sf_dir):
    df, plan = _plan(spark, sf_dir, "q_tpch_q15")
    rows = df.collect()
    assert rows
    revs = {r.total_rev_milli for r in rows}
    assert len(revs) == 1  # every returned supplier ties at the max


def test_q16_anti_join_excludes(spark, sf_dir):
    df, plan = _plan(spark, sf_dir, "q_tpch_q16")
    assert "LeftAnti" in plan
    rows = df.collect()
    n_good = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_acctbal") >= 1000)
        .count()
    )
    assert all(0 < r.supplier_cnt <= n_good for r in rows)


def test_q21_double_decorrelation_plan(spark, sf_dir):
    df, plan = _plan(spark, sf_dir, "q_tpch_q21")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    rows = df.collect()
    # numwait counts late lines; every reported supplier waited >= once
    assert all(r.numwait >= 1 for r in rows)
