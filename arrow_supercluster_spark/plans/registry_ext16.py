"""Round-2 registry additions, batch 11 — event-analytics shapes over
the events stream: ordered funnel conversion, day-k retention cohorts,
windowed event dedup (client-retry suppression), and string aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_funnel_conversion",
    """
    WITH m AS (
      SELECT user_id, event_type, MIN(ts) AS mt
      FROM events GROUP BY 1, 2
    ),
    funnel AS (
      SELECT v.user_id,
             c.mt IS NOT NULL AS did_click,
             p.mt IS NOT NULL AS did_purchase
      FROM m v
      LEFT JOIN m c ON c.user_id = v.user_id
                   AND c.event_type = 'click' AND c.mt > v.mt
      LEFT JOIN m p ON p.user_id = v.user_id
                   AND p.event_type = 'purchase'
                   AND c.mt IS NOT NULL AND p.mt > c.mt
      WHERE v.event_type = 'view'
    )
    SELECT COUNT(*) AS n_view,
           COUNT(*) FILTER (did_click) AS n_view_click,
           COUNT(*) FILTER (did_purchase) AS n_view_click_purchase
    FROM funnel
    """,
)
def q_funnel_conversion(spark, sf_dir):
    """Event analytics — ORDERED funnel (view → click → purchase, each
    step strictly after the previous): the conversion-rate primitive.
    Shape: one (user, type) min-ts agg collapses the event stream to
    ≤ |users|×|types| rows, then self-joins on user_id — all joins run
    on the collapsed table, never the raw stream; at 100 TB the agg's
    map-side combine does the heavy lifting and the join side is
    users-sized. (Strictly-after semantics make the count order-
    dependent-free: min timestamps are unique per user-type here, and
    ties break conservatively — no conversion on equal timestamps.)"""
    ev = read_events(spark, sf_dir)
    m = ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("mt"))
    v = m.filter(F.col("event_type") == "view").select("user_id", F.col("mt").alias("vt"))
    c = m.filter(F.col("event_type") == "click").select("user_id", F.col("mt").alias("ct"))
    p = m.filter(F.col("event_type") == "purchase").select("user_id", F.col("mt").alias("pt"))
    funnel = (
        v.join(c, "user_id", "left")
        .withColumn("did_click", F.col("ct").isNotNull() & (F.col("ct") > F.col("vt")))
        .join(p, "user_id", "left")
        .withColumn(
            "did_purchase",
            F.col("did_click") & F.col("pt").isNotNull() & (F.col("pt") > F.col("ct")),
        )
    )
    return funnel.agg(
        F.count(F.lit(1)).alias("n_view"),
        F.sum(F.col("did_click").cast("long")).alias("n_view_click"),
        F.sum(F.col("did_purchase").cast("long")).alias("n_view_click_purchase"),
    )


@register(
    "q_retention_cohorts",
    """
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             datediff('day', f.d0, CAST(e.ts AS DATE)) AS k
      FROM events e JOIN first_day f USING (user_id)
    )
    SELECT strftime(f.d0, '%Y-%m-%d') AS cohort_day,
           COUNT(DISTINCT f.user_id) AS cohort_size,
           COUNT(DISTINCT CASE WHEN a.k = 7 THEN a.user_id END) AS d7,
           COUNT(DISTINCT CASE WHEN a.k = 14 THEN a.user_id END) AS d14
    FROM first_day f LEFT JOIN activity a USING (user_id)
    GROUP BY 1
    """,
)
def q_retention_cohorts(spark, sf_dir):
    """Event analytics — day-k retention by acquisition cohort (the
    growth-accounting table): users grouped by their first-activity
    day, counted again if active exactly 7/14 days later. Two
    user-keyed aggregates + one broadcast-able join of the users-sized
    cohort table back onto per-day activity; the raw stream shuffles
    once (the distinct (user, k) projection)."""
    ev = read_events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    first_day = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    activity = (
        ev.join(first_day, "user_id")
        .select("user_id", "d0", F.datediff("d", "d0").alias("k"))
        .distinct()
    )
    return (
        activity.groupBy("d0")
        .agg(
            F.count_distinct("user_id").alias("cohort_size"),
            F.count_distinct(
                F.when(F.col("k") == 7, F.col("user_id"))
            ).alias("d7"),
            F.count_distinct(
                F.when(F.col("k") == 14, F.col("user_id"))
            ).alias("d14"),
        )
        .select(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            "cohort_size",
            "d7",
            "d14",
        )
    )


_DEDUP_WINDOW_S = 300  # suppress same (user, type) within 5 minutes


@register(
    "q_event_dedup_window",
    f"""
    SELECT event_id FROM (
      SELECT event_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap_us
      FROM events
    ) t
    WHERE gap_us IS NULL OR gap_us > {_DEDUP_WINDOW_S} * 1000000
    """,
)
def q_event_dedup_window(spark, sf_dir):
    """Event analytics — time-window dedup (client-retry suppression:
    drop a (user, type) event within 5 min of the previous kept-or-
    dropped one — the lag form, which both engines compute identically;
    the batch twin of streaming dropDuplicates-within-watermark). One
    window keyed by (user, type) — bounded per-user fan-in; ordered by
    (ts, event_id) so timestamp ties can't flip survivors."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    return (
        ev.select("event_id", gap.alias("gap_us"))
        .filter(
            F.col("gap_us").isNull()
            | (F.col("gap_us") > _DEDUP_WINDOW_S * 1_000_000)
        )
        .select("event_id")
    )


@register(
    "q_string_agg",
    """
    SELECT lang,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
             AS doc_ids,
           COUNT(*) AS n
    FROM documents WHERE doc_id % 25 = 0
    GROUP BY lang
    """,
)
def q_string_agg(spark, sf_dir):
    """Relational substrate — ordered string aggregation (listagg /
    group_concat, the report-export shape): per-language comma-joined
    doc-id list. Spark composes it as array_sort(collect_list) +
    array_join — partial-aggregable, deterministic order by explicit
    sort (never input order, which is partition-dependent). Filtered to
    1/25th so the strings stay cell-sized; unbounded group_concat at
    100 TB is an anti-pattern (a single row absorbing a group — use
    arrays/explode instead)."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 25 == 0)
    # sort NUMERICALLY before casting — sorting the strings would put
    # "100" before "25" and diverge from the oracle's ORDER BY doc_id
    ids_sorted = F.transform(
        F.array_sort(F.collect_list("doc_id")),
        lambda x: x.cast("string"),
    )
    return docs.groupBy("lang").agg(
        F.array_join(ids_sorted, ",").alias("doc_ids"),
        F.count(F.lit(1)).alias("n"),
    )
