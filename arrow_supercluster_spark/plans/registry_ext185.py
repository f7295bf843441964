"""Round-7 registry additions, batch 180 — time-spine repair and the
2-D heat grid (BH-FDR already ships as the ext101 per-type battery):

- q_gap_fill: daily-series gap repair per event type against a
  GENERATED day spine — days ≡ 0 (mod 5, by day-of-month) are held
  out of the input (the stated outage fixture), then every spine day
  ships zero-filled and linearly-interpolated values with prev/next
  anchors found by bounded self-joins (no IGNORE-NULLS window
  nuances, identical semantics in both engines).  The repair every
  downstream forecaster assumes has already happened.
- q_histogram_2d: hour-of-day × value-bucket count grid with
  independence expectations and Pearson residuals — the 2-D heatmap
  + "is time-of-day independent of spend" diagnostic in one pass.

At 100 TB: gap-fill collapses to ≤31 day rows per type before any
spine logic; the 2-D grid is a single 240-key partial-aggregated
groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# R540 — day-spine gap fill with linear interpolation
# ===========================================================================

_GF_HOLDOUT_MOD = 5  # day-of-month ≡ 0 (mod 5) held out = the gaps


@register(
    "q_gap_fill",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events
      WHERE day(CAST(ts AS DATE)) % {_GF_HOLDOUT_MOD} <> 0
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(day) AS lo, MAX(day) AS hi FROM daily
      GROUP BY 1
    ),
    spine AS (
      SELECT b.event_type, unnest(generate_series(b.lo, b.hi,
                                                  INTERVAL 1 DAY)) AS d
      FROM bounds b
    ),
    joined AS (
      SELECT s.event_type, CAST(s.d AS DATE) AS d, daily.n
      FROM spine s LEFT JOIN daily
        ON daily.event_type = s.event_type AND daily.day = CAST(s.d AS DATE)
    ),
    anchored AS (
      SELECT j.event_type, j.d, j.n,
             (SELECT MAX(p.day) FROM daily p
              WHERE p.event_type = j.event_type AND p.day < j.d)
               AS pd,
             (SELECT MIN(x.day) FROM daily x
              WHERE x.event_type = j.event_type AND x.day > j.d)
               AS nd
      FROM joined j
    )
    SELECT a.event_type, strftime(a.d, '%Y-%m-%d') AS day,
           a.n IS NULL AS is_gap,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS filled_zero,
           round(CASE
             WHEN a.n IS NOT NULL THEN a.n
             WHEN a.pd IS NULL THEN
               (SELECT n FROM daily q WHERE q.event_type = a.event_type
                AND q.day = a.nd)
             WHEN a.nd IS NULL THEN
               (SELECT n FROM daily q WHERE q.event_type = a.event_type
                AND q.day = a.pd)
             ELSE
               (SELECT n FROM daily q WHERE q.event_type = a.event_type
                AND q.day = a.pd)
               + ((SELECT n FROM daily q WHERE q.event_type = a.event_type
                   AND q.day = a.nd)
                  - (SELECT n FROM daily q WHERE q.event_type = a.event_type
                     AND q.day = a.pd))
                 * (a.d - a.pd) * 1.0 / (a.nd - a.pd)
           END, 4) AS filled_linear
    FROM anchored a ORDER BY event_type, day
    """,
)
def q_gap_fill(spark, sf_dir):
    """R540 — generated day spine per event type (sequence lo..hi),
    stated outage fixture (day-of-month ≡ 0 mod 5 held out), zero fill
    + linear interpolation with prev/next anchors via joins on the
    bounded daily frame.  Boundary gaps take the nearest anchor.  The
    corpus collapses once to ≤31 day rows per type; everything after
    is spine-sized."""
    ev = read_events(spark, sf_dir)
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .filter(F.dayofmonth("day") % _GF_HOLDOUT_MOD != 0)
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias(
                "d"
            ),
        )
    )
    joined = spine.join(
        daily.withColumnRenamed("day", "d"), ["event_type", "d"], "left"
    )
    obs = daily.select(
        F.col("event_type").alias("ot"),
        F.col("day").alias("od"),
        F.col("n").alias("on_"),
    )
    prev = (
        joined.join(
            obs,
            (F.col("ot") == F.col("event_type")) & (F.col("od") < F.col("d")),
            "left",
        )
        .groupBy("event_type", "d", "n")
        .agg(F.max("od").alias("pd"))
    )
    nxt = (
        joined.join(
            obs,
            (F.col("ot") == F.col("event_type")) & (F.col("od") > F.col("d")),
            "left",
        )
        .groupBy("event_type", "d")
        .agg(F.min("od").alias("nd"))
    )
    anch = prev.join(nxt, ["event_type", "d"])
    pv = obs.select(
        F.col("ot").alias("pt"), F.col("od").alias("pday"),
        F.col("on_").alias("pn"),
    )
    nv = obs.select(
        F.col("ot").alias("nt"), F.col("od").alias("nday"),
        F.col("on_").alias("nn"),
    )
    full = (
        anch.join(
            pv,
            (F.col("pt") == F.col("event_type"))
            & (F.col("pday") == F.col("pd")),
            "left",
        )
        .join(
            nv,
            (F.col("nt") == F.col("event_type"))
            & (F.col("nday") == F.col("nd")),
            "left",
        )
    )
    lin = (
        F.when(F.col("n").isNotNull(), F.col("n"))
        .when(F.col("pd").isNull(), F.col("nn"))
        .when(F.col("nd").isNull(), F.col("pn"))
        .otherwise(
            F.col("pn")
            + (F.col("nn") - F.col("pn"))
            * F.datediff(F.col("d"), F.col("pd"))
            * 1.0
            / F.datediff(F.col("nd"), F.col("pd"))
        )
    )
    return full.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").isNull().alias("is_gap"),
        F.coalesce(F.col("n"), F.lit(0)).alias("filled_zero"),
        F.round(lin, 4).alias("filled_linear"),
    ).orderBy("event_type", "day")


# ===========================================================================
# R541 — 2-D histogram with independence residuals
# ===========================================================================

_H2_VW = 50  # value-bucket width; values ≤ 490 ⇒ buckets 0..9


@register(
    "q_histogram_2d",
    f"""
    WITH cells AS (
      SELECT hour(ts) AS h,
             LEAST(CAST(floor(value / {_H2_VW}) AS BIGINT), 9) AS vb,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    marg AS (
      SELECT c.h, c.vb, c.n,
             (SELECT SUM(n) FROM cells x WHERE x.h = c.h) AS nh,
             (SELECT SUM(n) FROM cells x WHERE x.vb = c.vb) AS nv,
             (SELECT SUM(n) FROM cells) AS nn
      FROM cells c
    )
    SELECT h AS hour, vb AS value_bucket, n,
           round(nh * 1.0 * nv / nn, 4) AS expected,
           round((n - nh * 1.0 * nv / nn)
                 / sqrt(nh * 1.0 * nv / nn), 4) AS std_resid
    FROM marg ORDER BY hour, value_bucket
    """,
)
def q_histogram_2d(spark, sf_dir):
    """R541 — hour-of-day × value-bucket heat grid with independence
    expectations (row·col/total) and Pearson residuals: the 2-D
    rollup + "is spend independent of hour" diagnostic.  One 240-key
    partial-aggregated groupBy; marginals attach by broadcast."""
    ev = read_events(spark, sf_dir)
    cells = ev.groupBy(
        F.hour("ts").alias("h"),
        F.least(
            F.floor(F.col("value") / _H2_VW).cast("long"), F.lit(9)
        ).alias("vb"),
    ).agg(F.count(F.lit(1)).alias("n"))
    nh = cells.groupBy("h").agg(F.sum("n").alias("nh"))
    nv = cells.groupBy("vb").agg(F.sum("n").alias("nv"))
    nn = cells.agg(F.sum("n").alias("nn"))
    exp_ = F.col("nh") * 1.0 * F.col("nv") / F.col("nn")
    return (
        cells.join(F.broadcast(nh), "h")
        .join(F.broadcast(nv), "vb")
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("h").alias("hour"),
            F.col("vb").alias("value_bucket"),
            "n",
            F.round(exp_, 4).alias("expected"),
            F.round((F.col("n") - exp_) / F.sqrt(exp_), 4).alias(
                "std_resid"
            ),
        )
        .orderBy("hour", "value_bucket")
    )
