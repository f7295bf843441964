"""Round-2 registry additions, batch 15 — sequence & operations
analytics over the events stream:

- q_group_topk: per-group bounded top-k (WindowGroupLimit rewrite —
  the partial per-partition top-k below the Exchange);
- q_event_transitions: first-order event-type transition matrix
  (Markov chain estimate over per-user sequences);
- q_daily_anomaly: rolling-window z-score anomaly flags on daily
  volumes (composition of the rolling and z-score primitives);
- q_session_paths: top event-type paths per session (sessionize +
  ordered path fold).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events


# ===========================================================================
# Per-group bounded top-k
# ===========================================================================

_TOPK_K = 3


@register(
    "q_group_topk",
    f"""
    SELECT event_type, user_id, spend, rk FROM (
      SELECT event_type, user_id, spend,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY spend DESC, user_id) AS rk
      FROM (
        SELECT event_type, user_id, round(SUM(value), 4) AS spend
        FROM events GROUP BY 1, 2
      ) s
    ) r WHERE rk <= {_TOPK_K}
    """,
)
def q_group_topk(spark, sf_dir):
    """Relational substrate — per-group bounded top-k (top-{k} spenders
    per event type): the row_number + rank<=k form that Spark's
    WindowGroupLimit rewrite (3.5+) splits into a PARTIAL per-partition
    top-k below the Exchange — the shuffle moves O(partitions*k) rows
    per group, never a group's full membership into one reducer (same
    mechanism q_cosine_topk's ranking relies on; asserted for this plan
    in tests/test_plans.py). Spend pre-aggregated per (type, user) and
    rounded before ranking so ordering is cross-engine deterministic."""
    ev = read_events(spark, sf_dir)
    spend = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 4).alias("spend")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("spend").desc(), F.col("user_id")
    )
    return (
        spend.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK_K)
        .select("event_type", "user_id", "spend", "rk")
    )


# ===========================================================================
# Event-type transition matrix
# ===========================================================================

@register(
    "q_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pair AS (
      SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, SUM(n) AS t FROM pair GROUP BY 1)
    SELECT pair.src, pair.dst, pair.n,
           round(pair.n / CAST(tot.t AS DOUBLE), 6) AS p
    FROM pair JOIN tot USING (src)
    """,
)
def q_event_transitions(spark, sf_dir):
    """Sequence analytics — first-order transition matrix over per-user
    event streams (the Markov estimate behind next-action prediction
    and funnel diagnostics): one lead() window per user (bounded
    partitions, deterministic (ts, event_id) order), pair counts with
    map-side combine, marginals broadcast back. |types|² output rows."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    pair = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pair.groupBy("src").agg(F.sum("n").alias("t"))
    return (
        pair.join(F.broadcast(tot), "src")
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n") / F.col("t").cast("double"), 6).alias("p"),
        )
    )


# ===========================================================================
# Rolling z-score anomaly flags on daily volumes
# ===========================================================================

_ANOM_WIN = 7
_ANOM_Z = 2.0


@register(
    "q_daily_anomaly",
    f"""
    WITH daily AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT day, n,
             AVG(n) OVER w AS mu,
             stddev_samp(n) OVER w AS sd
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {_ANOM_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT day, n, round(mu, 6) AS mu,
           CASE WHEN sd IS NULL OR sd = 0 THEN 0
                WHEN abs((n - mu) / sd) > {_ANOM_Z} THEN 1 ELSE 0
           END AS is_anomaly
    FROM stats WHERE mu IS NOT NULL
    """,
)
def q_daily_anomaly(spark, sf_dir):
    """Ops analytics — trailing-window anomaly detection on daily event
    volume: each day scored against the mean/std of the PRECEDING
    {w} days (trailing frame excludes the current day, so a spike can't
    mask itself). Composition of the rolling-aggregate and z-score
    primitives (R43 + R32); the daily series is tiny (|days| rows), so
    the single unpartitioned window is bounded by the calendar, not the
    corpus — the events-to-daily collapse is the only data-sized agg."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-_ANOM_WIN, -1)
    stats = daily.select(
        "day",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sd"),
    )
    return stats.filter(F.col("mu").isNotNull()).select(
        "day",
        "n",
        F.round("mu", 6).alias("mu"),
        F.when(
            F.col("sd").isNull() | (F.col("sd") == 0), F.lit(0)
        )
        .when(
            F.abs((F.col("n") - F.col("mu")) / F.col("sd")) > _ANOM_Z,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_anomaly"),
    )


# ===========================================================================
# Session path analysis
# ===========================================================================

_SESSION_GAP_MIN = 30
_PATH_TOPK = 15


@register(
    "q_session_paths",
    f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    > {_SESSION_GAP_MIN} * 60 * 1000000
                  OR LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, event_type, ts, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS sess_id
      FROM ordered
    ),
    paths AS (
      SELECT user_id, sess_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY 1, 2
    )
    SELECT path, COUNT(*) AS n FROM paths
    GROUP BY 1 ORDER BY n DESC, path LIMIT {_PATH_TOPK}
    """,
)
def q_session_paths(spark, sf_dir):
    """Sequence analytics — top event-type paths per session (the
    'user journey' report): gap-based sessionization ({gap} min), the
    session's ordered type sequence folded to a '>'-joined path string,
    path frequencies TakeOrdered to the top {k}. The path fold is a
    sorted collect_list per (user, session) — bounded partitions — and
    the path-count agg is map-side combined; the final top-k never
    sorts the full path table."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    gap_us = _SESSION_GAP_MIN * 60 * 1_000_000
    sess = ev.withColumn(
        "new_sess",
        F.when(
            prev_us.isNull()
            | ((F.unix_micros("ts") - prev_us) > gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    paths = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.unix_micros("ts").alias("us"),
                                F.col("event_id").alias("eid"),
                                F.col("event_type").alias("et"),
                            )
                        )
                    ),
                    lambda s: s["et"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATH_TOPK)
    )
