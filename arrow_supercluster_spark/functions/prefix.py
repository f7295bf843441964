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

Determinism hazard (closed in round 3): RangePartitioner picks boundaries
by SAMPLING, and Spark does not guarantee identical boundaries across two
evaluations of the same plan.  The per-pid offsets and the rows they are
joined back to must therefore come from ONE materialization — the
partitioned frame is `localCheckpoint()`ed (eager, lineage-truncating, so
re-evaluation reads the stored blocks rather than re-sampling) before any
job touches it, and the offsets are computed with a window over the tiny
per-partition totals inside the same query instead of a driver collect.
Cost at scale: one executor-local copy of the projected columns, freed when
the RDD is GC'd — the price of an exact global scan.
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
    n = num_partitions or df.rdd.getNumPartitions()
    d = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    # single materialization: every downstream job sees the same boundaries
    d = d.localCheckpoint()
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn(
        "_local_before",
        F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long"),
    )
    # exclusive prefix sum over the |partitions|-row totals — tiny, so the
    # unpartitioned window is a non-issue; broadcast back as offsets
    wp = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_df = (
        d.groupBy("_pid")
        .agg(F.sum(value_col).alias("_psum"))
        .withColumn("_off", F.coalesce(F.sum("_psum").over(wp), F.lit(0)).cast("long"))
        .select("_pid", "_off")
    )
    return (
        d.join(F.broadcast(off_df), "_pid")
        .withColumn(out, (F.col("_local_before") + F.col("_off")).cast("long"))
        .drop("_pid", "_local_before", "_off")
    )
