"""Round-4 registry additions, batch 86 — three modern Spark API
surfaces, each oracle-checked against its relational equivalent:

- q_session_window: NATIVE session windows (F.session_window, the third
  windowing kind after the tumbling/sliding entries) — 30-min-gap
  sessions per user in ONE groupBy, no window functions. The oracle is
  the classic gaps-and-islands SQL, so the differential certifies
  Spark's merge semantics (window end = last event + gap) against the
  hand-built form. Same operator works unchanged on a stream.
- q_udtf_rle: a Python UDTF invoked as a POLYMORPHIC TABLE FUNCTION —
  `FROM rle(TABLE(events) PARTITION BY user_id ORDER BY ts, event_id)`
  — run-length-encoding each user's event-type sequence procedurally
  (per-partition instance state, flush at terminate()). This is the
  SQL-standard PTF shape (Spark 4 API) the engine needs for
  order-sensitive per-group logic that window functions can't express;
  the oracle rebuilds the runs with islands SQL.
- q_variant_agg: Spark 4 VARIANT ingestion — parse_json(props) into the
  binary semi-structured type, typed variant_get extraction, then a
  plain aggregate. The VARIANT path shreds JSON once at parse; the
  oracle uses DuckDB's JSON extraction.

At 100 TB: session_window is a streaming-safe single agg (state =
open sessions); the PTF partitions by user like any grouped op;
VARIANT keeps semi-structured columns columnar instead of re-parsing
strings per access.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_GAP_MIN = 30


@register(
    "q_session_window",
    f"""
    WITH seq AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev)
                          > {_GAP_MIN} * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM seq
    ),
    isl AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts)
               AS sess
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {_GAP_MIN} MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM isl GROUP BY user_id, sess
    """,
)
def q_session_window(spark, sf_dir):
    """Native session windows: one groupBy(user, session_window(ts,
    '30 minutes')) — Spark merges events whose gaps are < the timeout
    and reports [first_event, last_event + gap) windows, which is
    exactly what the islands oracle rebuilds. No per-row window
    functions, and the IDENTICAL expression is legal on a readStream
    (state = open sessions per user, closed by watermark)."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{_GAP_MIN} minutes")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "q_udtf_rle",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    isl AS (
      SELECT user_id, event_type,
             SUM(CASE WHEN prev IS NULL OR prev <> event_type
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run
      FROM seq
    )
    SELECT user_id, CAST(run - 1 AS BIGINT) AS run_idx,
           MIN(event_type) AS event_type,
           CAST(COUNT(*) AS BIGINT) AS run_len
    FROM isl GROUP BY user_id, run
    """,
)
def q_udtf_rle(spark, sf_dir):
    """Polymorphic table function: a Python UDTF consuming
    `TABLE(events) PARTITION BY user_id ORDER BY ts, event_id` and
    emitting one row per RUN of equal consecutive event types.
    Procedural per-partition state (current run + flush at
    terminate()) — the SQL-standard PTF shape for order-sensitive
    per-group logic; the islands oracle certifies both the run
    boundaries and that partition state does NOT bleed across users."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "user_id long, run_idx long, event_type string, run_len long"
        )
    )
    class RLERuns:
        def __init__(self):
            self.user = None
            self.cur = None
            self.n = 0
            self.idx = 0

        def eval(self, row):
            u, t = row["user_id"], row["event_type"]
            if self.cur is None:
                self.user, self.cur, self.n = u, t, 1
            elif t == self.cur:
                self.n += 1
            else:
                yield (self.user, self.idx, self.cur, self.n)
                self.idx += 1
                self.cur = t
                self.n = 1
                self.user = u

        def terminate(self):
            if self.cur is not None:
                yield (self.user, self.idx, self.cur, self.n)

    spark.udtf.register("rle_runs", RLERuns)
    read_events(spark, sf_dir).createOrReplaceTempView("events_rle_in")
    return spark.sql(
        "SELECT user_id, run_idx, event_type, run_len FROM rle_runs("
        "TABLE(events_rle_in) PARTITION BY user_id ORDER BY (ts, event_id))"
    )


@register(
    "q_variant_agg",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(CAST(json_extract(props, '$.k') AS INTEGER)), 4)
             AS avg_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
             AS max_k
    FROM events GROUP BY event_type
    """,
)
def q_variant_agg(spark, sf_dir):
    """Spark 4 VARIANT path: parse_json shreds the props JSON string
    into the binary semi-structured type ONCE; variant_get pulls a
    typed field without string re-parsing. The aggregate itself is
    ordinary. At 100 TB the difference is columnar access to
    semi-structured data instead of per-access JSON string scans."""
    ev = read_events(spark, sf_dir)
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").cast("long").alias("max_k"),
        )
    )
