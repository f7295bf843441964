"""Unit tests for the as-of join and skew-safe aggregation operators."""

import pandas as pd
from pyspark.sql import functions as F

from arrow_supercluster_spark.functions.skew import salted_count_sum, salted_join
from arrow_supercluster_spark.operators.asof import asof_join


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (2, 5, "e3"), (1, 3, "e4")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (2, 7, 300.0)],
        "k long, rt long, v double",
    )
    out = asof_join(
        left, right, "k", "k", "t", "rt", right_values=["v"]
    ).toPandas().set_index("name")
    assert out.loc["e1", "v"] == 100.0   # t=10 → rt=5
    assert out.loc["e2", "v"] == 200.0   # t=20 → rt=15
    assert pd.isna(out.loc["e3", "v"])   # t=5 < rt=7 → no match
    assert pd.isna(out.loc["e4", "v"])   # t=3 < rt=5 → no match


def test_asof_equal_time_matches(spark):
    left = spark.createDataFrame([(1, 5, "e")], "k long, t long, name string")
    right = spark.createDataFrame([(1, 5, 9.0)], "k long, rt long, v double")
    out = asof_join(left, right, "k", "k", "t", "rt", ["v"]).collect()
    assert out[0].v == 9.0  # ties: right row at equal time IS a match


def test_asof_null_right_value_whole_row(spark):
    """Right rows with a NULL value column must NOT mix columns across
    right rows — the match is the whole latest row, like DuckDB ASOF JOIN
    (ADVICE r1: per-column last(ignorenulls) mixed old/new rows)."""
    left = spark.createDataFrame([(1, 20, "e")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 5, 100.0, "old"), (1, 15, None, "new")],
        "k long, rt long, v double, tag string",
    )
    out = asof_join(left, right, "k", "k", "t", "rt", ["v", "tag"]).collect()[0]
    # latest right row at t=20 is rt=15 → (NULL, "new"); NOT (100.0, "new")
    assert out.tag == "new" and out.v is None


def test_salted_agg_equals_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = salted_count_sum(
        li, ["l_returnflag"], ["l_quantity"], ["l_orderkey", "l_linenumber"]
    ).toPandas().sort_values("l_returnflag").reset_index(drop=True)
    plain = (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_l_quantity"))
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    assert list(salted.n) == list(plain.n)
    assert (salted.sum_l_quantity.round(6) == plain.sum_l_quantity.round(6)).all()


def test_salted_join_equals_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(cust, "o_custkey").count()
    salted = salted_join(
        orders, cust, "o_custkey", n_salts=8, salt_cols=["o_orderkey"]
    ).count()
    assert plain == salted
