"""Round-4 registry additions, batch 94 — warehouse fact patterns and
execution-weighted pricing:

- q_accumulating_snapshot: the Kimball accumulating-snapshot fact —
  one row per order carrying its lifecycle milestones (first/last
  ship, line count, value) and the derived lags. Completes the
  dimensional-modeling set: SCD2 (R249), CDC fold (R263), date dim
  (R162), and now the milestone fact.
- q_vwap: volume- and time-weighted average price per part over its
  lineitem executions — VWAP = Σ(price·qty)/Σqty (exact cents), TWAP
  weights each execution by its holding interval to the next (per-part
  windows, bounded postings). The finance twin of the plain AVG.

At 100 TB: both are one join + one keyed agg; the TWAP lag window
partitions by part.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register


@register(
    "q_accumulating_snapshot",
    """
    WITH lines AS (
      SELECT l_orderkey,
             MIN(l_shipdate) AS first_ship,
             MAX(l_shipdate) AS last_ship,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS value_cents
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey AS orderkey, o.o_orderpriority AS priority,
           o.o_orderdate AS order_ts, l.first_ship, l.last_ship,
           l.n_lines, l.value_cents,
           CAST(CAST(l.first_ship AS DATE) - CAST(o.o_orderdate AS DATE)
                AS BIGINT) AS days_to_first_ship,
           CAST(CAST(l.last_ship AS DATE) - CAST(l.first_ship AS DATE)
                AS BIGINT) AS ship_span_days
    FROM orders o JOIN lines l ON l.l_orderkey = o.o_orderkey
    """,
)
def q_accumulating_snapshot(spark, sf_dir):
    """Accumulating-snapshot fact: per-order lifecycle milestones
    (order → first ship → last ship) with lag measures, built by one
    lineitem collapse + one key join. Value carried as exact integer
    cents (the q_range_frame convention). The canonical process-
    tracking fact table a warehouse refreshes as milestones land."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lines = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
        ).alias("value_cents"),
    )
    return o.join(lines, o.o_orderkey == lines.l_orderkey).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("order_ts"),
        "first_ship", "last_ship", "n_lines", "value_cents",
        F.datediff(F.to_date("first_ship"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("days_to_first_ship"),
        F.datediff(F.to_date("last_ship"), F.to_date("first_ship"))
        .cast("long")
        .alias("ship_span_days"),
    )


@register(
    "q_vwap",
    """
    WITH ex AS (
      SELECT l_partkey AS part, l_shipdate AS ts,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS px_cents,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             l_orderkey AS k
      FROM lineitem
    ),
    spans AS (
      SELECT part, px_cents, qty,
             CAST(CAST(lead(ts) OVER (PARTITION BY part ORDER BY ts, k)
                       AS DATE) - CAST(ts AS DATE) AS BIGINT) AS dt_days
      FROM ex
    )
    SELECT part,
           CAST(COUNT(*) AS BIGINT) AS n_exec,
           CAST(SUM(px_cents * qty) AS BIGINT) AS pv_cents,
           CAST(SUM(qty) AS BIGINT) AS volume,
           CAST(SUM(CASE WHEN dt_days IS NOT NULL
                         THEN px_cents * dt_days ELSE 0 END) AS BIGINT)
             AS pt_cents_days,
           CAST(SUM(coalesce(dt_days, 0)) AS BIGINT) AS span_days
    FROM spans GROUP BY part
    """,
)
def q_vwap(spark, sf_dir):
    """Execution-weighted pricing per part: the VWAP numerator/
    denominator (Σ price·qty / Σ qty) and the TWAP pair (price weighted
    by the interval to the NEXT execution — a lead window partitioned
    by part, bounded postings; shipdates are midnight-only so intervals
    are calendar-day diffs, which are timezone-free on both engines).
    All sums are exact integers (cents, cents·days), so consumers
    divide without cross-engine float drift.
    The last execution of each part carries no interval (open
    position) and contributes 0 TWAP weight."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ex = li.select(
        F.col("l_partkey").alias("part"),
        F.col("l_shipdate").alias("ts"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("px_cents"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
        F.col("l_orderkey").alias("k"),
    )
    w = Window.partitionBy("part").orderBy("ts", "k")
    spans = ex.select(
        "part", "px_cents", "qty",
        F.datediff(F.to_date(F.lead("ts").over(w)), F.to_date("ts"))
        .cast("long")
        .alias("dt_days"),
    )
    return spans.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_exec"),
        F.sum(F.col("px_cents") * F.col("qty")).alias("pv_cents"),
        F.sum("qty").alias("volume"),
        F.sum(
            F.when(
                F.col("dt_days").isNotNull(),
                F.col("px_cents") * F.col("dt_days"),
            ).otherwise(F.lit(0))
        ).alias("pt_cents_days"),
        F.sum(F.coalesce("dt_days", F.lit(0))).alias("span_days"),
    )
