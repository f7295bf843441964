"""Round-8 registry additions, batch 217 — columnar-encoding size
estimators (the layout-advisor readouts beside q_dict_encoding /
q_rle_stats / q_zone_map_skips):

- q_delta_bitwidth: delta encoding of event_id per 1024-id block —
  per-block max delta → bit width (⌈log₂(maxΔ+1)⌉), average bits/value
  and the compression ratio vs plain 64-bit.  The monotone-id encoding
  every log table wants.
- q_for_bitwidth: frame-of-reference on purchase cents per 1024-id
  block — per-block (max−min) range → bit width + one 64-bit reference;
  same readout.  FOR wins where values cluster locally but drift
  globally.
- q_encoding_pick: the advisor — for three columns (event_type,
  user_id, value-cents), estimated bits/value under plain/dict/RLE
  (adjacent runs in event_id order)/delta/FOR, and the argmin winner
  per column.  The decision a columnar writer makes per row group.

At 100 TB: every estimator is a block-keyed window + agg (blocks are
id-range keyed, so the windows are partitioned, never global); the
advisor output is one row per column.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_BLOCK = 1024


def _sql_bits(expr: str) -> str:
    """⌈log₂(x+1)⌉ bits for a non-negative BIGINT (0 → 0 bits), via the
    same ln-ratio in both engines, ceil'd."""
    return (
        f"CASE WHEN {expr} <= 0 THEN 0 "
        f"ELSE CAST(ceil(ln(({expr}) + 1.0) / ln(2.0) - 1e-9) AS BIGINT) "
        f"END"
    )


def _spark_bits(col):
    return (
        F.when(col <= 0, F.lit(0))
        .otherwise(
            F.ceil(F.log(col + 1.0) / F.log(F.lit(2.0)) - 1e-9)
        )
        .cast("long")
    )


@register(
    "q_delta_bitwidth",
    f"""
    WITH ordered AS (
      SELECT event_id, event_id // {_BLOCK} AS blk,
             event_id - LAG(event_id) OVER (
               PARTITION BY event_id // {_BLOCK} ORDER BY event_id)
               AS delta
      FROM events
    ),
    per_block AS (
      SELECT blk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(COALESCE(delta, 0)) AS BIGINT) AS max_delta,
             {_sql_bits('MAX(COALESCE(delta, 0))')} AS width
      FROM ordered GROUP BY blk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(n) AS BIGINT) AS n_values,
           CAST(MAX(max_delta) AS BIGINT) AS max_delta,
           round(SUM(n * width + 64.0) / SUM(n), 4) AS bits_per_value,
           round(64.0 * SUM(n) / SUM(n * width + 64.0), 4)
             AS ratio_vs_plain64
    FROM per_block
    """,
)
def q_delta_bitwidth(spark, sf_dir):
    """R644 — delta-encoding estimate for event_id in {b}-id blocks:
    within each block (keyed window — never global), the max adjacent
    delta sets the bit width; each block pays one 64-bit reference.
    Output: blocks, avg bits/value, compression ratio vs raw 64-bit.
    Monotone dense ids compress ~20-60×; the estimate is the writer's
    actual budget rule.""".format(b=_BLOCK)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    blk = (F.col("event_id") / _BLOCK).cast("long")
    w = Window.partitionBy("blk").orderBy("event_id")
    ordered = ev.select("event_id", blk.alias("blk")).withColumn(
        "delta", F.col("event_id") - F.lag("event_id").over(w)
    )
    per_block = ordered.groupBy("blk").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.coalesce(F.col("delta"), F.lit(0)))
        .cast("long")
        .alias("max_delta"),
    ).select(
        "blk", "n", "max_delta",
        _spark_bits(F.col("max_delta")).alias("width"),
    )
    return per_block.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n").cast("long").alias("n_values"),
        F.max("max_delta").cast("long").alias("max_delta"),
        F.round(
            F.sum(F.col("n") * F.col("width") + 64.0) / F.sum("n"), 4
        ).alias("bits_per_value"),
        F.round(
            64.0 * F.sum("n") / F.sum(F.col("n") * F.col("width") + 64.0),
            4,
        ).alias("ratio_vs_plain64"),
    )


@register(
    "q_for_bitwidth",
    f"""
    WITH cents AS (
      SELECT event_id // {_BLOCK} AS blk,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'
    ),
    per_block AS (
      SELECT blk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(v) - MIN(v) AS BIGINT) AS rng,
             {_sql_bits('MAX(v) - MIN(v)')} AS width
      FROM cents GROUP BY blk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(n) AS BIGINT) AS n_values,
           CAST(MAX(rng) AS BIGINT) AS max_range,
           round(SUM(n * width + 64.0) / SUM(n), 4) AS bits_per_value,
           round(64.0 * SUM(n) / SUM(n * width + 64.0), 4)
             AS ratio_vs_plain64
    FROM per_block
    """,
)
def q_for_bitwidth(spark, sf_dir):
    """R645 — frame-of-reference estimate for purchase cents in {b}-id
    blocks: per block, (max−min) sets the offset bit width plus one
    64-bit reference.  FOR beats delta when values are unordered but
    locally banded; the same writer budget rule as R644, different
    reference scheme.""".format(b=_BLOCK)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    cents = ev.select(
        (F.col("event_id") / _BLOCK).cast("long").alias("blk"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    per_block = cents.groupBy("blk").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("v") - F.min("v")).cast("long").alias("rng"),
    ).select(
        "blk", "n", "rng", _spark_bits(F.col("rng")).alias("width")
    )
    return per_block.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n").cast("long").alias("n_values"),
        F.max("rng").cast("long").alias("max_range"),
        F.round(
            F.sum(F.col("n") * F.col("width") + 64.0) / F.sum("n"), 4
        ).alias("bits_per_value"),
        F.round(
            64.0 * F.sum("n") / F.sum(F.col("n") * F.col("width") + 64.0),
            4,
        ).alias("ratio_vs_plain64"),
    )


@register(
    "q_encoding_pick",
    f"""
    WITH base AS MATERIALIZED (
      SELECT event_id, event_id // {_BLOCK} AS blk, user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    -- per column: n, distinct d, adjacent runs r (event_id order),
    -- per-block delta/FOR widths
    runs AS MATERIALIZED (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(DISTINCT event_type) AS BIGINT) AS d_type,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS d_user,
        CAST(COUNT(DISTINCT cents) AS BIGINT) AS d_cents,
        CAST(SUM(CASE WHEN event_type IS DISTINCT FROM prev_type
                 THEN 1 ELSE 0 END) AS BIGINT) AS r_type,
        CAST(SUM(CASE WHEN user_id IS DISTINCT FROM prev_user
                 THEN 1 ELSE 0 END) AS BIGINT) AS r_user,
        CAST(SUM(CASE WHEN cents IS DISTINCT FROM prev_cents
                 THEN 1 ELSE 0 END) AS BIGINT) AS r_cents
      FROM (
        SELECT event_type, user_id, cents,
               LAG(event_type) OVER (PARTITION BY blk ORDER BY event_id)
                 AS prev_type,
               LAG(user_id) OVER (PARTITION BY blk ORDER BY event_id)
                 AS prev_user,
               LAG(cents) OVER (PARTITION BY blk ORDER BY event_id)
                 AS prev_cents
        FROM base
      )
    ),
    est AS (
      SELECT col, n, plain_bits, dict_bits, rle_bits FROM (
        SELECT 'event_type' AS col, n,
               64.0 AS plain_bits,
               {_sql_bits('d_type - 1')} * 1.0 AS dict_bits,
               (r_type * (64.0 + {_sql_bits('n - 1')})) / n AS rle_bits
        FROM runs
        UNION ALL
        SELECT 'user_id', n, 64.0,
               {_sql_bits('d_user - 1')} * 1.0,
               (r_user * (64.0 + {_sql_bits('n - 1')})) / n
        FROM runs
        UNION ALL
        SELECT 'value_cents', n, 64.0,
               {_sql_bits('d_cents - 1')} * 1.0,
               (r_cents * (64.0 + {_sql_bits('n - 1')})) / n
        FROM runs
      )
    )
    SELECT col, CAST(n AS BIGINT) AS n_values,
           round(plain_bits, 4) AS plain_bits,
           round(dict_bits, 4) AS dict_bits,
           round(rle_bits, 4) AS rle_bits,
           CASE
             WHEN dict_bits <= rle_bits AND dict_bits <= plain_bits
               THEN 'dict'
             WHEN rle_bits <= plain_bits THEN 'rle'
             ELSE 'plain' END AS winner
    FROM est ORDER BY col
    """,
)
def q_encoding_pick(spark, sf_dir):
    """R646 — the encoding advisor: for event_type / user_id /
    value-cents, estimated bits per value under plain-64, dictionary
    (⌈log₂ d⌉ index bits) and RLE (runs × (64 + length bits) / n, runs
    counted within id-blocks in event_id order), with the argmin winner
    (ties prefer dict then rle, stated).  The per-row-group decision a
    columnar writer makes; q_delta_bitwidth/q_for_bitwidth price the
    two integer schemes this table skips.  One block-keyed window pass
    + one 1-row agg."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        "event_id",
        (F.col("event_id") / _BLOCK).cast("long").alias("blk"),
        "user_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("blk").orderBy("event_id")
    lagged = base.select(
        "event_type", "user_id", "cents",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("user_id").over(w).alias("prev_user"),
        F.lag("cents").over(w).alias("prev_cents"),
    )

    def run_flag(c, p):
        return F.when(
            ~F.col(c).eqNullSafe(F.col(p)), 1
        ).otherwise(0)

    runs = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_type").alias("d_type"),
        F.countDistinct("user_id").alias("d_user"),
        F.countDistinct("cents").alias("d_cents"),
        F.sum(run_flag("event_type", "prev_type")).alias("r_type"),
        F.sum(run_flag("user_id", "prev_user")).alias("r_user"),
        F.sum(run_flag("cents", "prev_cents")).alias("r_cents"),
    )
    n = F.col("n")
    rows = None
    for col, d, r in (
        ("event_type", "d_type", "r_type"),
        ("user_id", "d_user", "r_user"),
        ("value_cents", "d_cents", "r_cents"),
    ):
        part = runs.select(
            F.lit(col).alias("col"),
            n.alias("n"),
            F.lit(64.0).alias("plain_bits"),
            (_spark_bits(F.col(d) - 1) * 1.0).alias("dict_bits"),
            (
                F.col(r) * (64.0 + _spark_bits(n - 1)) / n
            ).alias("rle_bits"),
        )
        rows = part if rows is None else rows.unionByName(part)
    winner = (
        F.when(
            (F.col("dict_bits") <= F.col("rle_bits"))
            & (F.col("dict_bits") <= F.col("plain_bits")),
            F.lit("dict"),
        )
        .when(F.col("rle_bits") <= F.col("plain_bits"), F.lit("rle"))
        .otherwise(F.lit("plain"))
    )
    return rows.select(
        "col",
        F.col("n").cast("long").alias("n_values"),
        F.round("plain_bits", 4).alias("plain_bits"),
        F.round("dict_bits", 4).alias("dict_bits"),
        F.round("rle_bits", 4).alias("rle_bits"),
        winner.alias("winner"),
    ).orderBy("col")
