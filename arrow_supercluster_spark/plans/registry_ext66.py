"""Round-2 registry additions, batch 61 — seasonal decomposition,
in-session affinity, and variance testing:

- q_seasonal_index: day-of-week seasonal indices + deseasonalized
  daily residuals (the decomposition q_seasonality's heatmap implies);
- q_session_cooccurrence: within-session event-type co-occurrence lift
  (market-basket over sessions, q_assoc_rules' behavioral twin);
- q_anova_f: one-way ANOVA F statistic for document length across
  languages — does the grouping explain the variance?
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Seasonal index
# ===========================================================================

@register(
    "q_seasonal_index",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(strftime(ts, '%w') AS INTEGER) AS dow,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    m AS (SELECT AVG(n) AS mu FROM daily),
    idx AS (
      SELECT dow, round(AVG(n) / ANY_VALUE(mu), 6) AS seasonal_index
      FROM daily CROSS JOIN m GROUP BY dow
    )
    SELECT epoch_us(daily.d) AS day_us, daily.dow, daily.n,
           idx.seasonal_index,
           round(daily.n / idx.seasonal_index, 6) AS deseasonalized
    FROM daily JOIN idx USING (dow)
    """,
)
def q_seasonal_index(spark, sf_dir):
    """Time series — multiplicative weekly decomposition: per-day-of-
    week seasonal index (dow mean over grand mean) and each day's
    deseasonalized count — the step q_seasonality's heatmap implies but
    doesn't take; anomaly screens (q_daily_anomaly) run cleaner on the
    residual. Two tiny aggs (|days|, 7 rows) and a 7-row broadcast
    join back."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"),
        (F.dayofweek("ts") - 1).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))
    m = daily.agg(F.avg("n").alias("mu"))
    idx = (
        daily.crossJoin(F.broadcast(m))
        .groupBy("dow")
        .agg(F.round(F.avg("n") / F.first("mu"), 6).alias("seasonal_index"))
    )
    return daily.join(F.broadcast(idx), "dow").select(
        F.unix_micros("d").alias("day_us"), "dow", "n", "seasonal_index",
        F.round(F.col("n") / F.col("seasonal_index"), 6).alias("deseasonalized"),
    )


# ===========================================================================
# Session co-occurrence lift
# ===========================================================================

_GAP_MIN = 30


@register(
    "q_session_cooccurrence",
    f"""
    WITH marked AS (
      SELECT user_id, ts, event_type, event_id,
             CASE WHEN lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {_GAP_MIN * 60 * 1000000}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    baskets AS (
      SELECT DISTINCT user_id, session_no, event_type FROM sess
    ),
    n AS (SELECT COUNT(DISTINCT (user_id, session_no)) AS n_sessions FROM baskets),
    item AS (SELECT event_type, COUNT(*) AS c FROM baskets GROUP BY 1),
    pair AS (
      SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS c12
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.session_no = b.session_no
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.t1, p.t2, p.c12,
           round(p.c12 * 1.0 / n_sessions, 6) AS support,
           round((p.c12 * 1.0 / n_sessions)
                 / ((i1.c * 1.0 / n_sessions) * (i2.c * 1.0 / n_sessions)), 6)
             AS lift
    FROM pair p
    JOIN item i1 ON i1.event_type = p.t1
    JOIN item i2 ON i2.event_type = p.t2
    CROSS JOIN n
    """,
)
def q_session_cooccurrence(spark, sf_dir):
    """Behavioral affinity — within-SESSION event-type co-occurrence
    with lift (market-basket where the basket is a 30-min session —
    q_assoc_rules' behavioral twin): lift > 1 means the two actions
    travel together beyond chance. Sessions collapse to distinct
    (session, type) baskets first, so the pair join is keyed by session
    and bounded by |types| per basket; marginals broadcast."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > _GAP_MIN * 60 * 1000000), 1).otherwise(0),
    ).withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    baskets = sess.select("user_id", "session_no", "event_type").distinct()
    n_sessions = baskets.select("user_id", "session_no").distinct().count()
    item = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.select("user_id", "session_no", F.col("event_type").alias("t1"))
    b = baskets.select("user_id", "session_no", F.col("event_type").alias("t2"))
    pair = (
        a.join(b, ["user_id", "session_no"])
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    i1 = item.select(F.col("event_type").alias("t1"), F.col("c").alias("c1"))
    i2 = item.select(F.col("event_type").alias("t2"), F.col("c").alias("c2"))
    sup = F.col("c12") * 1.0 / F.lit(n_sessions)
    lift = sup / (
        (F.col("c1") * 1.0 / F.lit(n_sessions))
        * (F.col("c2") * 1.0 / F.lit(n_sessions))
    )
    return (
        pair.join(F.broadcast(i1), "t1")
        .join(F.broadcast(i2), "t2")
        .select(
            "t1", "t2", "c12",
            F.round(sup, 6).alias("support"),
            F.round(lift, 6).alias("lift"),
        )
    )


# ===========================================================================
# One-way ANOVA
# ===========================================================================

@register(
    "q_anova_f",
    """
    WITH g AS (
      SELECT lang, COUNT(*) AS n, AVG(CAST(n_chars AS DOUBLE)) AS mu,
             SUM(CAST(n_chars AS DOUBLE) * n_chars) AS ss
      FROM documents GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n) AS nt, SUM(n * mu) / SUM(n) AS grand,
             COUNT(*) AS k
      FROM g
    ),
    parts AS (
      SELECT SUM(n * (mu - grand) * (mu - grand)) AS ss_between,
             SUM(ss - n * mu * mu) AS ss_within,
             ANY_VALUE(k) AS k, ANY_VALUE(nt) AS nt
      FROM g CROSS JOIN tot
    )
    SELECT k AS n_groups, nt AS n_total,
           round(ss_between / (k - 1), 4) AS ms_between,
           round(ss_within / (nt - k), 4) AS ms_within,
           round((ss_between / (k - 1)) / (ss_within / (nt - k)), 6) AS f_stat
    FROM parts
    """,
)
def q_anova_f(spark, sf_dir):
    """Hypothesis testing — one-way ANOVA F for document length across
    languages: between-group over within-group mean squares — does
    language explain length variance (feeding q_median_length_filter's
    per-lang thresholds with a significance footing)? Group moments (n,
    mean, Σx²) come from ONE agg — SS_within via the Σx² − n·μ²
    identity, no second pass; the F assembly runs on |langs| rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    x = F.col("n_chars").cast("double")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("mu"),
        F.sum(x * F.col("n_chars")).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").alias("nt"),
        (F.sum(F.col("n") * F.col("mu")) / F.sum("n")).alias("grand"),
        F.count(F.lit(1)).alias("k"),
    )
    parts = g.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("n") * (F.col("mu") - F.col("grand")) * (F.col("mu") - F.col("grand"))
        ).alias("ss_between"),
        F.sum(F.col("ss") - F.col("n") * F.col("mu") * F.col("mu")).alias(
            "ss_within"
        ),
        F.first("k").alias("k"),
        F.first("nt").alias("nt"),
    )
    msb = F.col("ss_between") / (F.col("k") - 1)
    msw = F.col("ss_within") / (F.col("nt") - F.col("k"))
    return parts.select(
        F.col("k").alias("n_groups"),
        F.col("nt").alias("n_total"),
        F.round(msb, 4).alias("ms_between"),
        F.round(msw, 4).alias("ms_within"),
        F.round(msb / msw, 6).alias("f_stat"),
    )
