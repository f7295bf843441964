"""Round-7 registry additions, batch 195 — warehouse temporal-modeling
operators (the SCD machinery every lakehouse dimension table needs):

- q_scd2_history: slowly-changing-dimension type-2 reconstruction —
  per user, runs of equal "status" (the event_type stream ordered by
  (ts, event_id)) collapse to versioned rows with valid_from /
  valid_to (NULL = current) and a version number.  Run boundaries via
  a user-partitioned lag; run ids via a per-user conditional running
  sum — never a global window.
- q_snapshot_at: the point-in-time read over that history — each
  user's status as of the stated timestamp (latest change ≤ T), the
  operation behind AS OF queries and training-data time-travel.
- q_change_feed: the change-data-feed daily digest — per day the
  count of status CHANGES vs same-status events (idempotent writes),
  plus first-seen users; the monitoring readout of a CDC pipeline.

At 100 TB: all three are one user-partitioned sort-window pass (Spark
range-partitions by user; no reducer sees more than one user's spill
window) followed by per-user or per-day rollups.  Timestamps compare
as exact instants; counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_SNAP_AT = "2024-01-16 00:00:00"

_SQL_RUNS = """
      seq AS (
        SELECT user_id, ts, event_id, event_type AS status,
               LAG(event_type) OVER w AS prev_status
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      marked AS (
        SELECT user_id, ts, event_id, status,
               CASE WHEN prev_status IS NULL
                         OR prev_status <> status
                    THEN 1 ELSE 0 END AS is_change
        FROM seq
      ),
      runs AS (
        SELECT user_id, ts, event_id, status, is_change,
               SUM(is_change) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS version
        FROM marked
      )
"""


def _runs(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("status"),
        F.lag("event_type").over(w).alias("prev_status"),
    )
    marked = seq.withColumn(
        "is_change",
        F.when(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("status")),
            1,
        ).otherwise(0),
    )
    return marked.withColumn("version", F.sum("is_change").over(w))


# ===========================================================================
# R581 — SCD2 history reconstruction
# ===========================================================================

@register(
    "q_scd2_history",
    f"""
    WITH {_SQL_RUNS},
    versions AS (
      SELECT user_id, version, MIN(status) AS status,
             MIN(ts) AS valid_from
      FROM runs GROUP BY 1, 2
    )
    SELECT v.user_id, CAST(v.version AS BIGINT) AS version, v.status,
           strftime(v.valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(n.valid_from, '%Y-%m-%d %H:%M:%S') AS valid_to,
           n.valid_from IS NULL AS is_current
    FROM versions v
    LEFT JOIN versions n
      ON n.user_id = v.user_id AND n.version = v.version + 1
    ORDER BY v.user_id, v.version
    """,
)
def q_scd2_history(spark, sf_dir):
    """R581 — SCD2 rows: (user, version, status, valid_from,
    valid_to, is_current) — valid_to = the next version's valid_from
    (half-open intervals), NULL on the open current row.  Status is
    constant within a run so MIN(status) is exact; the next-version
    join is an equi-join on (user, version+1)."""
    runs = _runs(spark, sf_dir)
    versions = runs.groupBy("user_id", "version").agg(
        F.min("status").alias("status"),
        F.min("ts").alias("valid_from"),
    )
    nxt = versions.select(
        F.col("user_id").alias("nu"),
        (F.col("version") - 1).alias("nv"),
        F.col("valid_from").alias("next_from"),
    )
    return (
        versions.join(
            nxt,
            (F.col("nu") == F.col("user_id"))
            & (F.col("nv") == F.col("version")),
            "left",
        )
        .select(
            "user_id",
            F.col("version").cast("long").alias("version"),
            "status",
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
                "valid_from"
            ),
            F.date_format("next_from", "yyyy-MM-dd HH:mm:ss").alias(
                "valid_to"
            ),
            F.col("next_from").isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


# ===========================================================================
# R582 — point-in-time snapshot (AS OF read)
# ===========================================================================

@register(
    "q_snapshot_at",
    f"""
    WITH {_SQL_RUNS},
    versions AS (
      SELECT user_id, version, MIN(status) AS status,
             MIN(ts) AS valid_from
      FROM runs GROUP BY 1, 2
    ),
    pit AS (
      SELECT user_id, MAX(version) AS v
      FROM versions
      WHERE valid_from <= TIMESTAMP '{_SNAP_AT}'
      GROUP BY 1
    )
    SELECT a.user_id, v.status,
           CAST(v.version AS BIGINT) AS version,
           strftime(v.valid_from, '%Y-%m-%d %H:%M:%S') AS since
    FROM pit a JOIN versions v
      ON v.user_id = a.user_id AND v.version = a.v
    ORDER BY a.user_id
    """,
)
def q_snapshot_at(spark, sf_dir):
    """R582 — AS OF {_SNAP_AT}: per user the highest version whose
    valid_from ≤ T (users whose first event is after T are absent —
    they did not exist yet).  One filtered max per user + an
    equi-join back for the attributes."""
    runs = _runs(spark, sf_dir)
    versions = runs.groupBy("user_id", "version").agg(
        F.min("status").alias("status"),
        F.min("ts").alias("valid_from"),
    )
    at = F.lit(_SNAP_AT).cast("timestamp")
    asof = (
        versions.filter(F.col("valid_from") <= at)
        .groupBy("user_id")
        .agg(F.max("version").alias("v"))
    )
    return (
        asof.join(
            versions.select(
                F.col("user_id").alias("vu"),
                F.col("version"),
                "status",
                "valid_from",
            ),
            (F.col("vu") == F.col("user_id"))
            & (F.col("version") == F.col("v")),
        )
        .select(
            "user_id",
            "status",
            F.col("version").cast("long").alias("version"),
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias(
                "since"
            ),
        )
        .orderBy("user_id")
    )


# ===========================================================================
# R583 — change-data-feed daily digest
# ===========================================================================

@register(
    "q_change_feed",
    f"""
    WITH {_SQL_RUNS},
    firsts AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1
    )
    SELECT strftime(CAST(r.ts AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(r.is_change) AS BIGINT) AS n_changes,
           CAST(SUM(1 - r.is_change) AS BIGINT) AS n_idempotent,
           CAST(SUM(CASE WHEN f.first_ts = r.ts
                          AND r.is_change = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new_users,
           round(SUM(r.is_change) * 1.0 / COUNT(*), 6) AS change_rate
    FROM runs r JOIN firsts f ON f.user_id = r.user_id
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_change_feed(spark, sf_dir):
    """R583 — per day: status changes vs idempotent (same-status)
    events, first-seen users (a user's very first event is always a
    change), and the change rate — what a CDC monitor plots.  One
    lag pass + a broadcastable per-user first-ts join."""
    runs = _runs(spark, sf_dir)
    firsts = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )
    return (
        runs.join(firsts, "user_id")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum("is_change").alias("n_changes"),
            F.sum(1 - F.col("is_change")).alias("n_idempotent"),
            F.sum(
                F.when(
                    (F.col("first_ts") == F.col("ts"))
                    & (F.col("is_change") == 1),
                    1,
                ).otherwise(0)
            ).alias("n_new_users"),
            F.round(
                F.sum("is_change") * 1.0 / F.count(F.lit(1)), 6
            ).alias("change_rate"),
        )
        .orderBy("day")
    )
