"""Round-2 registry additions, batch 55 — dedup threshold tuning and
session engagement:

- q_dedup_threshold_sweep: duplicate-component counts at Jaccard
  thresholds 0.3/0.5/0.7 — how the dup graph coalesces as the knob
  loosens (the tuning artifact behind every near-dup deployment);
- q_bounce_rate: single-event-session (bounce) rate per entry event
  type — the engagement readout over the 30-min sessionization.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import dedup
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS
from arrow_supercluster_spark.sources.tables import read_events

_SWEEP_TS = (0.3, 0.5, 0.7)


def _sql_sweep_one(t: float) -> str:
    edges = f"""
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM (SELECT doc_id, list_distinct({SQL_TOKS}) AS toks FROM documents) a
      JOIN (SELECT doc_id, list_distinct({SQL_TOKS}) AS toks FROM documents) b
        ON b.doc_id = a.doc_id + 1
      WHERE len(list_intersect(a.toks, b.toks)) * 1.0
            / len(list_distinct(list_concat(a.toks, b.toks))) >= {t}
    """
    return f"""
    SELECT {t} AS threshold,
           (SELECT COUNT(*) FROM ({edges}) e) AS n_edges,
           (SELECT COUNT(DISTINCT node) FROM (
              SELECT u AS node FROM ({edges}) e1
              UNION SELECT v FROM ({edges}) e2)) AS n_nodes
    """


@register(
    "q_dedup_threshold_sweep",
    " UNION ALL ".join(_sql_sweep_one(t) for t in _SWEEP_TS),
)
def q_dedup_threshold_sweep(spark, sf_dir):
    """Dedup tuning — the threshold-sensitivity sweep: adjacent-pair
    Jaccard edges and touched nodes at thresholds 0.3/0.5/0.7. Edges
    collapse monotonically as the threshold tightens — the curve that
    picks the production knob (too loose merges topics, too tight
    misses rewrites; cf. q_dup_cluster_sizes for the shape at the
    chosen point). One tokenized pass reused across thresholds; the
    edge test is in-row set algebra."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.array_distinct(dedup.tokenize(F.col("text"))).alias("toks")
    )
    a = toks.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"))
    b = toks.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))
    jac = (
        F.size(F.array_intersect("a_toks", "b_toks"))
        * F.lit(1.0)
        / F.size(F.array_union("a_toks", "b_toks"))
    )
    pairs = (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .select("a_id", "b_id", jac.alias("jac"))
        .localCheckpoint(eager=False)
    )
    outs = []
    for t in _SWEEP_TS:
        e = pairs.filter(F.col("jac") >= t)
        n_edges = e.count()
        n_nodes = (
            e.select(F.col("a_id").alias("node"))
            .unionByName(e.select(F.col("b_id").alias("node")))
            .distinct()
            .count()
        )
        outs.append((float(t), n_edges, n_nodes))
    return spark.createDataFrame(
        outs, "threshold double, n_edges long, n_nodes long"
    )


_GAP_MIN = 30


@register(
    "q_bounce_rate",
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
      SELECT user_id, ts, event_type, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    per_session AS (
      SELECT user_id, session_no,
             MIN(ts) AS t0,
             COUNT(*) AS n_events
      FROM sess GROUP BY 1, 2
    ),
    entry AS (
      SELECT p.user_id, p.session_no, p.n_events, s.event_type AS entry_type
      FROM per_session p
      JOIN sess s ON s.user_id = p.user_id AND s.session_no = p.session_no
      WHERE s.ts = p.t0
        AND s.event_id = (
          SELECT MIN(s2.event_id) FROM sess s2
          WHERE s2.user_id = p.user_id AND s2.session_no = p.session_no
            AND s2.ts = p.t0
        )
    )
    SELECT entry_type,
           COUNT(*) AS n_sessions,
           SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_bounces,
           round(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS bounce_rate
    FROM entry GROUP BY entry_type
    """,
)
def q_bounce_rate(spark, sf_dir):
    """Engagement — bounce rate per entry event type: the share of
    30-min sessions that end after a single event, keyed by what the
    session STARTED with (the landing-page health metric). Sessionize
    is the lag+cumsum window pair (q_sessionize); the entry event is
    the (min ts, min event_id) row per session — picked with a window,
    not a correlated subquery, on the Spark side; counts collapse to
    |types| rows."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > _GAP_MIN * 60 * 1000000), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    ranked = sess.select(
        "user_id", "session_no", "event_type",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id", "session_no"))
        .alias("n_events"),
    )
    entry = ranked.filter(F.col("rn") == 1)
    return entry.groupBy(F.col("event_type").alias("entry_type")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("int")).alias("n_bounces"),
        F.round(
            F.sum((F.col("n_events") == 1).cast("int")) * 1.0 / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
    )
