"""As-of (point-in-time) join — a training-pipeline staple the reference
lacks (SURVEY §2a note: "no hash/sort-merge/as-of" joins).

For each left row (key, t), attach the latest right row with the same key
and right_time ≤ t. Implemented with the union+window pattern:

  union(tagged left, tagged right) → window last_value(ignorenulls) over
  (key ORDER BY time, side) → keep left rows.

ONE shuffle on (key), no range-join explosion, no per-key driver loops —
the canonical Spark shape for as-of at scale (AQE handles key skew).
DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
) -> DataFrame:
    """Returns `left` with `right_values` columns from the as-of match
    (null when no right row precedes the left row's time)."""
    # All right values travel as ONE struct so last(ignorenulls) picks every
    # column from the SAME matched right row — per-column last() would mix
    # columns across right rows whenever a right value is NULL, diverging
    # from DuckDB ASOF JOIN's whole-row semantics.
    rv = F.struct(*[F.col(c) for c in right_values]).alias("_rv")
    lt = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),  # left sorts after right at equal time
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(rv).schema["_rv"].dataType
        ).alias("_rv"),
    )
    rt = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        rv,
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "_side",
        "_l",
        F.last("_rv", ignorenulls=True).over(w).alias("_rv"),
    )
    out = filled.filter(F.col("_side") == 1)
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in out.schema["_l"].dataType.names],
        *[F.col(f"_rv.{c}").alias(c) for c in right_values],
    )


def interval_join(
    left,
    right,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bin_seconds: int = 1800,
):
    """Range (interval) join: left rows matched to every right interval
    containing their timestamp — WITHOUT the nested-loop a naive
    `ON ts BETWEEN start AND end` falls into.

    Scale shape (the standard interval-binning trick): both sides map to
    fixed-width time bins — the left row to its one bin, the right
    interval EXPLODED to each bin it overlaps (intervals comparable to
    `bin_seconds` explode to ≤2 rows) — candidate pairs come from a
    hash-partitioned equi-join on the bin, and the exact BETWEEN filter
    keeps true matches. Each matching pair shares exactly one bin (the
    left row's), so no dedup is needed. Pick `bin_seconds` near the
    typical interval length: cost is O(|left| + |right|·span/bin) shuffled
    rows instead of |left|·|right| compared pairs.
    """
    from pyspark.sql import functions as F

    lb = left.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts)) / F.lit(bin_seconds))
    )
    rb = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / F.lit(bin_seconds)),
                F.floor(F.unix_timestamp(F.col(end)) / F.lit(bin_seconds)),
            )
        ),
    )
    return (
        lb.join(rb, "_bin")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bin")
    )
