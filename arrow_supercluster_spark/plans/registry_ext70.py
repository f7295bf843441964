"""Round-2 registry additions, batch 65 — cross-source content overlap
and temporal-rhythm similarity:

- q_vocab_overlap: vocabulary Jaccard between source pairs — the
  content-word complement of q_stylometry_delta's function-word
  distance;
- q_temporal_profile_sim: cosine similarity of hourly activity
  profiles between event types — which behaviors share a rhythm.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_vocab_overlap",
    f"""
    WITH vocab AS (
      SELECT DISTINCT source, tok FROM (
        SELECT source, unnest(list_filter({SQL_TOKS}, t -> t != '')) AS tok
        FROM documents
      )
    ),
    sizes AS (SELECT source, COUNT(*) AS v FROM vocab GROUP BY 1),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common,
           round(i.n_common * 1.0 / (sa.v + sb.v - i.n_common), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
)
def q_vocab_overlap(spark, sf_dir):
    """Source characterization — vocabulary Jaccard between source
    pairs: shared distinct tokens over the union — the CONTENT-overlap
    matrix (q_stylometry_delta measures register via function words;
    this measures topic via the whole vocabulary; q_cross_source_overlap
    measures literal text reuse). The join carries (source, token) keys
    only; per-source sizes broadcast onto |sources|² pair rows."""
    docs = _docs(spark, sf_dir)
    vocab = docs.select(
        "source",
        F.explode(
            F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
        ).alias("tok"),
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = vocab.select(F.col("source").alias("src_a"), "tok")
    b = vocab.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("v").alias("va"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("v").alias("vb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_common",
            F.round(
                F.col("n_common") * 1.0
                / (F.col("va") + F.col("vb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "q_temporal_profile_sim",
    """
    WITH prof AS (
      SELECT event_type, CAST(strftime(ts, '%H') AS INTEGER) AS hod,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             SUM(a.n * b.n) AS dot
      FROM prof a JOIN prof b
        ON a.hod = b.hod AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    norms AS (
      SELECT event_type, sqrt(SUM(n * n)) AS nrm FROM prof GROUP BY 1
    )
    SELECT p.t1, p.t2,
           round(p.dot / (n1.nrm * n2.nrm), 6) AS cosine
    FROM pairs p
    JOIN norms n1 ON n1.event_type = p.t1
    JOIN norms n2 ON n2.event_type = p.t2
    """,
)
def q_temporal_profile_sim(spark, sf_dir):
    """Behavioral rhythm — cosine similarity of 24-hour activity
    profiles between event types: near-1 pairs share a daily rhythm
    (driven by the same user circadian pattern), low pairs are
    temporally distinct behaviors — the similarity view over
    q_seasonality's per-type histograms. Profiles are |types|×24 rows;
    the pair join is hod-keyed on that tiny table."""
    ev = read_events(spark, sf_dir)
    prof = ev.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = prof.select(F.col("event_type").alias("t1"), "hod", F.col("n").alias("na"))
    b = prof.select(F.col("event_type").alias("t2"), "hod", F.col("n").alias("nb"))
    pairs = (
        a.join(b, "hod")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("dot"))
    )
    norms = prof.groupBy("event_type").agg(
        F.sqrt(F.sum(F.col("n") * F.col("n"))).alias("nrm")
    )
    n1 = norms.select(F.col("event_type").alias("t1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("event_type").alias("t2"), F.col("nrm").alias("nrm2"))
    return (
        pairs.join(F.broadcast(n1), "t1")
        .join(F.broadcast(n2), "t2")
        .select(
            "t1", "t2",
            F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")), 6).alias(
                "cosine"
            ),
        )
    )
