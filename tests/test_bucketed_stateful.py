"""Tests: bucketed co-located join (shuffle-free plan) and the
applyInPandasWithState streaming dedup."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import pandas as pd
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.bucketed import bucket_table, bucketed_join
from arrow_supercluster_spark.streaming.stateful import streaming_dedup


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bucket_table(orders, "orders_b", "o_orderkey", 4)
    bucket_table(lineitem, "lineitem_b", "l_orderkey", 4)

    joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
    # force SMJ (broadcast would hide the bucketing win at this tiny scale)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # correctness: same row count as the plain join
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_streaming_dedup_first_wins(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dedup_stream").toPandas()

    from arrow_supercluster_spark.operators.dedup import exact_dedup_groups

    want = exact_dedup_groups(docs).toPandas()
    # one emitted row per distinct hash, and it is the min-doc_id keeper
    assert len(got) == len(want)
    g = got.sort_values("text_hash").reset_index(drop=True)
    w = want.sort_values("text_hash").reset_index(drop=True)
    assert list(g.text_hash) == list(w.text_hash)
    assert list(g.doc_id) == list(w.keeper_id)
