"""Bucketed (co-located) joins — pre-shuffle big fact tables once so the
recurring join is shuffle-free (SURVEY mandate: "bucketing for co-located
joins").

`bucket_tables` writes both sides bucketed+sorted by the join key into the
session catalog; `bucketed_join` then joins the saved tables — Catalyst
plans a SortMergeJoin with NO Exchange on either side (asserted in
tests/test_bucketed.py). At 100 TB this converts an every-query shuffle of
the fact table into a one-time write cost, the standard warehouse layout
for star-schema fact-fact joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucket_table(
    df: DataFrame, name: str, key: str, n_buckets: int = 8
) -> None:
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[left_key] == r[right_key])
