"""Streaming event aggregation — the Structured Streaming form of
q_event_windows (registry_ext), plus a streaming cluster-feed sketch.

The reference is batch-only (no streams — SURVEY §2a note); this module is
extension surface: the same tumbling-window aggregate expressed over
readStream with a watermark, so late events are handled and state is
bounded. At scale this runs per-microbatch with state in the
HDFS/RocksDB-backed state store; the aggregation itself is identical to
the batch expression (Spark reuses the same logical plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_windows(
    events_stream: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream(events) → watermark → 1h tumbling window counts/sums.

    Output schema matches the batch q_event_windows (hour string,
    n_events, sum_value) so batch and streaming results are directly
    comparable (the test feeds the same parquet through both paths).
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based) — the stateful-streaming
    pattern the reference lacks entirely; built on Spark's native
    session_window (no custom state handler needed)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_cluster_counts(points_stream: DataFrame, zoom: int, opts=None) -> DataFrame:
    """Live grid-cluster feed: the batch A1-grid aggregate
    (grid_cluster.cluster_grid) expressed over a point STREAM — per
    micro-batch, cell counts and weighted-centroid sums update in the
    state store, so a dashboard can watch clusters grow as points arrive.

    Identical logical shape to the batch aggregate (same cell derivation,
    same sums), so complete-mode output equals cluster_grid on the same
    data — asserted streaming≡batch in tests/test_streaming.py. State is
    O(occupied cells at `zoom`), hash-partitioned by cell like the batch
    shuffle."""
    from arrow_supercluster_spark.config import DEFAULT_OPTIONS
    from arrow_supercluster_spark.operators.grid_cluster import (
        cell_agg,
        prepare_points,
        with_cells,
    )

    o = opts or DEFAULT_OPTIONS
    return cell_agg(with_cells(prepare_points(points_stream), zoom, o), zoom)


def maintain_hierarchy(points_stream: DataFrame, engine) -> "object":
    """Streaming hierarchy maintenance: fold each micro-batch of points
    into an ArrowClusterEngine via the leaf merge algebra
    (engine.append) — the incremental counterpart of the reference
    layer's rebuild-on-data-change (arrow-cluster-layer.ts:89-106), which
    re-clusters from scratch; here each batch costs O(|batch| + occupied
    cells) and the full corpus is never rescanned.

    Each batch is persisted to parquet under the engine workdir BEFORE
    appending, because the foreachBatch DataFrame is only valid during
    its micro-batch while the engine retains point lineage for singleton
    coordinate joins. Returns the StreamingQuery; callers typically use
    trigger(availableNow=True) + awaitTermination for catch-up ingest or
    leave it running for continuous maintenance."""

    def _fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import os as _os

        path = f"{engine.workdir}/stream_batches/{batch_id}"
        # foreachBatch is AT-LEAST-ONCE: after a crash between the fold
        # and the checkpoint commit, the same batch_id is re-delivered.
        # The fold mutates engine state (leaf merge), so replaying it
        # would double-count — a durable per-batch marker makes the fold
        # idempotent (written only after the merge completes).
        marker = f"{path}._folded"
        if _os.path.exists(marker):
            return
        batch_df.write.mode("overwrite").parquet(path)
        stable = batch_df.sparkSession.read.parquet(path)
        if engine._nodes is None:
            engine.load(stable)
        else:
            engine.append(stable)
        open(marker, "w").close()

    return (
        points_stream.writeStream.outputMode("append")
        .foreachBatch(_fold)
        .option("checkpointLocation", f"{engine.workdir}/stream_ckpt")
    )


def trending_counts(
    events_stream: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming half of 'trending event types': per (1h window ×
    event_type) counts with a watermark. Ranking is NOT done here —
    window functions cannot run incrementally on an unbounded stream, so
    the streaming job maintains only the mergeable counts (state bounded
    by |windows in watermark| × |types|) and the consumer (or a
    foreachBatch finisher) applies `finish_trending_topk` per emitted
    window. The split is the point: counts stream, ranks finish."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n",
        )
    )


def finish_trending_topk(counts: DataFrame, k: int = 3) -> DataFrame:
    """Batch finisher: rank the (hour, event_type, n) counts to the
    top-k per hour (count desc, type asc — deterministic)."""
    from pyspark.sql import Window

    w = Window.partitionBy("hour").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("hour", "event_type", "n", "rk")
    )
