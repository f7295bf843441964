"""Round-2 registry additions, batch 73 — arrival-process diagnostics
and early-value prediction:

- q_interarrival: per-event-type inter-arrival gap percentiles within
  user streams — the distribution that justifies (or indicts) the
  30-minute sessionization gap;
- q_early_value_corr: correlation between each user's FIRST-WEEK spend
  and their total spend — does early behavior predict lifetime value?
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_interarrival",
    """
    WITH gaps AS (
      SELECT event_type,
             (epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id))
               / 60000000.0 AS gap_min
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_gaps,
           round(quantile_cont(gap_min, 0.5), 6) AS p50_min,
           round(quantile_cont(gap_min, 0.9), 6) AS p90_min,
           round(quantile_cont(gap_min, 0.99), 6) AS p99_min
    FROM gaps WHERE gap_min IS NOT NULL
    GROUP BY event_type
    """,
)
def q_interarrival(spark, sf_dir):
    """Arrival process — inter-arrival gap percentiles (minutes) within
    user streams, by the type of the ARRIVING event: the distribution a
    sessionization gap is chosen against (a 30-min cut should sit in
    the valley between within-session and between-session modes — cf.
    q_sessionize, q_fano_dispersion). One lag window on the
    user-partitioned stream, one percentile agg per bounded type
    group."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    ) / 60000000.0
    gaps = ev.select("event_type", gap.alias("gap_min")).filter(
        F.col("gap_min").isNotNull()
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.expr("percentile(gap_min, 0.5)"), 6).alias("p50_min"),
        F.round(F.expr("percentile(gap_min, 0.9)"), 6).alias("p90_min"),
        F.round(F.expr("percentile(gap_min, 0.99)"), 6).alias("p99_min"),
    )


@register(
    "q_early_value_corr",
    """
    WITH firsts AS (
      SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events GROUP BY 1
    ),
    vals AS (
      SELECT e.user_id,
             round(SUM(CASE WHEN epoch_us(e.ts) < f.t0 + 7 * 86400000000
                            THEN e.value ELSE 0 END), 4) AS week1,
             round(SUM(e.value), 4) AS total
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.value IS NOT NULL
      GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_users,
           round(corr(week1, total), 6) AS pearson,
           round(AVG(week1 / total), 6) AS mean_week1_share
    FROM vals WHERE total > 0
    """,
)
def q_early_value_corr(spark, sf_dir):
    """Early-value prediction — does week-1 spend predict lifetime
    spend? Pearson correlation between each user's first-7-day spend
    and their total, plus the mean week-1 share — the number that says
    whether early-tenure signals (q_user_features at day 7) can stand
    in for the full-horizon label. One user collapse with a conditional
    sum (the window rides the same agg), one corr."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    firsts = read_events(spark, sf_dir).groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("t0")
    )
    vals = (
        ev.join(firsts, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.unix_micros("ts") < F.col("t0") + 7 * 86400000000,
                        F.col("value"),
                    ).otherwise(0.0)
                ),
                4,
            ).alias("week1"),
            F.round(F.sum("value"), 4).alias("total"),
        )
    )
    v = vals.filter(F.col("total") > 0)
    return v.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.corr("week1", "total"), 6).alias("pearson"),
        F.round(F.avg(F.col("week1") / F.col("total")), 6).alias(
            "mean_week1_share"
        ),
    )
