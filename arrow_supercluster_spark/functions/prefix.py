"""Distributed exact global prefix sum — the scan primitive behind
concat-and-chunk sequence packing, global offsets, and file layout.

A naive `SUM(...) OVER (ORDER BY key)` is an UNPARTITIONED window: every
row shuffles into one reducer — the cosine-topk anti-pattern at corpus
scale. The classic two-phase scan fixes it:

1. range-repartition + sort within partitions by the (unique) order key —
   one range shuffle, the only data movement;
2. per-partition running sum — a window PARTITIONED by the physical
   partition id, so each task scans only its own rows;
3. per-partition totals (one tiny agg, |partitions| rows) are prefix-
   summed on the driver and broadcast back as offsets.

The result is independent of the partition boundaries RangePartitioner
picks (the order key is unique and the offsets are exact), so the output
is deterministic under any parallelism — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out: str = "cum_before",
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds `out` = sum of `value_col` over all rows with a strictly
    smaller `order_col` (exclusive prefix sum). `order_col` must be
    unique."""
    spark = df.sparkSession
    n = num_partitions or df.rdd.getNumPartitions()
    d = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "_local_before",
        F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long"),
    )
    part_rows = sorted(
        d.groupBy("_pid").agg(F.sum(value_col).alias("_psum")).collect(),
        key=lambda r: r._pid,
    )
    acc = 0
    offsets = []
    for r in part_rows:
        offsets.append((r._pid, acc))
        acc += int(r._psum or 0)
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.col("_local_before") + F.col("_off")).cast("long"))
        .drop("_pid", "_local_before", "_off")
    )
