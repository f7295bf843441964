"""Streaming anomaly detection — stream-static z-score flags.

The production shape: baselines (per-key mean/std) are computed in
batch over the historical corpus and BROADCAST; the live event stream
joins them statelessly per micro-batch and flags |z| ≥ threshold. No
state store, no watermark coupling — the baseline is a static frame
the planner broadcasts into every micro-batch, so the streaming plan
is a map-only stage over each batch (the same stream-static posture as
streaming/dedup.streaming_contamination_hits).

Determinism contract: baseline moments accumulate INTEGER cents (sums
and sums-of-squares of BIGINTs are exact and commutative), so the
mean/std doubles — and therefore every z-score and every flag — are
bit-identical across engines, partitionings, and batch/stream
execution. That is what lets tests/test_batch111.py assert the
streaming result equals the batch SQL twin row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_THRESHOLD = 3.0


def baseline_stats(events: DataFrame) -> DataFrame:
    """Per-event_type (mean, std) of `value`, accumulated in exact
    integer cents: mean = Σc/(100n), var = (Σc² − (Σc)²/n)/(10⁴(n−1)).
    A |event_types|-row frame — broadcastable at any corpus size."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sc"),
            F.sum(cents * cents).alias("ssq"),
        )
        .select(
            "event_type",
            (F.col("sc") / (100.0 * F.col("n"))).alias("mean"),
            F.sqrt(
                (
                    F.col("ssq")
                    - F.col("sc") * F.col("sc") / F.col("n")
                )
                / (10000.0 * (F.col("n") - 1))
            ).alias("std"),
        )
    )


def streaming_anomaly_flags(
    stream: DataFrame,
    baseline: DataFrame,
    z_threshold: float = Z_THRESHOLD,
) -> DataFrame:
    """Stream-static broadcast join + z-score filter. Works identically
    on a batch DataFrame (the streaming≡batch test relies on that)."""
    joined = stream.join(F.broadcast(baseline), "event_type")
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        joined.withColumn("z", z)
        .filter(F.abs(F.col("z")) >= z_threshold)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round("z", 4).alias("z"),
        )
    )
