"""Round-2 registry additions, batch 72 — engagement depth and
categorical drift:

- q_session_depth: the distribution of session lengths (events per
  30-min session) — the engagement histogram behind q_bounce_rate's
  single number;
- q_priority_mix_by_year: order-priority shares per order year — the
  categorical drift series (PSI's categorical sibling on the orders
  dimension).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events, read_table

_GAP_MIN = 30


@register(
    "q_session_depth",
    f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
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
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    depth AS (
      SELECT user_id, session_no, COUNT(*) AS n_events
      FROM sess GROUP BY 1, 2
    )
    SELECT n_events AS depth, COUNT(*) AS n_sessions
    FROM depth GROUP BY n_events
    """,
)
def q_session_depth(spark, sf_dir):
    """Engagement — the session-DEPTH histogram: how many 30-min
    sessions contain 1, 2, … events (q_bounce_rate reads off the
    depth=1 bin; this is the whole distribution — the engagement shape
    a product tracks release over release). Sessionize windows + two
    collapsing aggs; the histogram key is bounded by the longest
    session."""
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
    depth = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return depth.groupBy(F.col("n_events").alias("depth")).agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


@register(
    "q_priority_mix_by_year",
    """
    WITH yearly AS (
      SELECT CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS yr,
             o_orderpriority AS priority, COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT yr, SUM(n) AS t FROM yearly GROUP BY 1)
    SELECT y.yr, y.priority, y.n,
           round(y.n * 1.0 / t.t, 6) AS share
    FROM yearly y JOIN tot t USING (yr)
    """,
)
def q_priority_mix_by_year(spark, sf_dir):
    """Drift — order-priority SHARES per order year: the categorical
    composition series (q_psi_drift bins a numeric; this tracks a
    categorical dimension's mix over time — a shifting priority mix is
    an upstream-process change). One (year, priority) agg + per-year
    totals broadcast back; |years|×|priorities| rows."""
    o = read_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = yearly.groupBy("yr").agg(F.sum("n").alias("t"))
    return yearly.join(F.broadcast(tot), "yr").select(
        "yr", "priority", "n",
        F.round(F.col("n") * 1.0 / F.col("t"), 6).alias("share"),
    )
