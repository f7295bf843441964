"""Round-2 registry additions, batch 60 — source characterization and
growth series:

- q_ctfidf: class-based TF-IDF (c-TF-IDF): top-5 characteristic terms
  per SOURCE — the topic-labeling variant where the class, not the
  document, is the unit;
- q_wow_growth: week-over-week event-count growth per type — the
  growth series every ops review opens with.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

_CT_TOP = 5


@register(
    "q_ctfidf",
    f"""
    WITH toks AS (
      SELECT source, unnest(list_filter({SQL_TOKS}, t -> t != '')) AS tok
      FROM documents
    ),
    tf AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    src_len AS (SELECT source, SUM(c) AS n FROM tf GROUP BY 1),
    cls AS (
      SELECT tok, COUNT(*) AS n_classes FROM tf GROUP BY tok
    ),
    nc AS (SELECT COUNT(DISTINCT source) AS total_classes FROM tf),
    scored AS (
      SELECT tf.source, tf.tok,
             round((tf.c * 1.0 / s.n)
                   * ln(1.0 + total_classes * 1.0 / n_classes), 9) AS score
      FROM tf
      JOIN src_len s USING (source)
      JOIN cls USING (tok)
      CROSS JOIN nc
    )
    SELECT source, tok, score, rk FROM (
      SELECT source, tok, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, tok) AS rk
      FROM scored
    ) WHERE rk <= {_CT_TOP}
    """,
)
def q_ctfidf(spark, sf_dir):
    """Source characterization — c-TF-IDF (class-based TF-IDF, the
    BERTopic labeling formulation): term frequency within the SOURCE,
    inverse CLASS frequency ln(1 + |classes|/classes-containing) —
    top-{k} characteristic terms per source, the automatic label for
    'what is this crawl actually about'. One token agg, class counts
    broadcast, a per-source bounded rank window.""".format(k=_CT_TOP)
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source",
        F.explode(
            F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
        ).alias("tok"),
    )
    tf = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    src_len = tf.groupBy("source").agg(F.sum("c").alias("n"))
    cls = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("n_classes"))
    total_classes = tf.select("source").distinct().count()
    scored = (
        tf.join(F.broadcast(src_len), "source")
        .join(F.broadcast(cls), "tok")
        .select(
            "source", "tok",
            F.round(
                (F.col("c") * 1.0 / F.col("n"))
                * F.log(1.0 + F.lit(float(total_classes)) / F.col("n_classes")),
                9,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CT_TOP)
        .select("source", "tok", "score", "rk")
    )


@register(
    "q_wow_growth",
    """
    WITH weekly AS (
      SELECT event_type,
             CAST(floor((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                        / 604800000000.0) AS BIGINT) AS week,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, n,
           lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
           CASE WHEN lag(n) OVER (PARTITION BY event_type ORDER BY week) > 0
                THEN round((n - lag(n) OVER (PARTITION BY event_type
                                             ORDER BY week)) * 1.0
                           / lag(n) OVER (PARTITION BY event_type
                                          ORDER BY week), 6)
                END AS wow_growth
    FROM weekly
    """,
)
def q_wow_growth(spark, sf_dir):
    """Growth — week-over-week change per event type (weeks anchored at
    2024-01-01, integer-µs arithmetic): the first slide of every ops
    review. One (type, week) partial agg; the lag window runs on the
    |types|×|weeks| rollup, never the stream."""
    ev = read_events(spark, sf_dir)
    anchor = F.unix_micros(F.to_timestamp(F.lit("2024-01-01")))
    week = F.floor(
        (F.unix_micros("ts") - anchor) / 604800000000.0
    ).cast("long")
    weekly = ev.groupBy("event_type", week.alias("week")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(w)
    return weekly.select(
        "event_type", "week", "n",
        prev.alias("prev_n"),
        F.when(prev > 0, F.round((F.col("n") - prev) * 1.0 / prev, 6)).alias(
            "wow_growth"
        ),
    )
