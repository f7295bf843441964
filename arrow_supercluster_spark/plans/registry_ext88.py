"""Round-4 registry additions, batch 83 — sparse-vector text similarity,
positional phrase retrieval, and sequence-typicality scoring:

- q_tf_cosine_adjacent: bag-of-words TF cosine between adjacent-doc
  pairs via a token equi-join — THE scalable sparse text-similarity
  pattern (no dense vectors, no all-pairs: the dot product is a join on
  (pair, token), norms are per-doc aggregates). Complements the dense
  embedding cosine (q_cosine_topk) and set-based Jaccard
  (q_jaccard_adjacent / q_idf_weighted_jaccard).
- q_phrase_search: exact phrase retrieval over a POSITIONAL inverted
  index — posting-list self-join on (doc, pos+1); the index-side twin of
  q_inverted_index (which carries doc-level postings only).
- q_sequence_likelihood: per-user average log-likelihood of their
  event-type sequence under the corpus MLE first-order Markov model —
  the sequence-anomaly score built on q_event_transitions' matrix
  (users whose behavior is atypical get low avg_ll).

At 100 TB: TF cosine shuffles (token, pair) rows with integer counts,
never text; phrase search joins two bounded posting lists; the Markov
model is a |types|² broadcast.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_tf_cosine_adjacent",
    f"""
    WITH tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents)
      GROUP BY doc_id, tok
    ),
    nrm AS (
      SELECT doc_id, sqrt(CAST(SUM(c * c) AS BIGINT)) AS n FROM tf
      GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(SUM(a.c * b.c) AS BIGINT) AS dot
      FROM tf a JOIN tf b ON b.doc_id = a.doc_id + 1 AND a.tok = b.tok
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT na.doc_id AS a_id, nb.doc_id AS b_id,
           ROUND(coalesce(d.dot, 0) / (na.n * nb.n), 6) AS tf_cos
    FROM nrm na JOIN nrm nb ON nb.doc_id = na.doc_id + 1
    LEFT JOIN dots d ON d.a_id = na.doc_id
    """,
)
def q_tf_cosine_adjacent(spark, sf_dir):
    """Sparse TF cosine for adjacent-doc pairs. The dot product is a
    token equi-join over per-doc term frequencies (integer-exact until
    the final division), norms are per-doc sqrt(Σc²); token-disjoint
    pairs keep a 0 row via the left join. At scale the same kernel runs
    on LSH-candidate pairs instead of the adjacent-id probe frame."""
    docs = _docs(spark, sf_dir)
    tf = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nrm = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("n")
    )
    a = tf.select(F.col("doc_id").alias("a_id"), "tok", F.col("c").alias("ca"))
    b = tf.select(
        (F.col("doc_id") - 1).alias("a_id"),
        "tok",
        F.col("c").alias("cb"),
    )
    dots = (
        a.join(b, ["a_id", "tok"])
        .groupBy("a_id")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    nb = nrm.select(
        (F.col("doc_id") - 1).alias("a_id"),
        F.col("doc_id").alias("b_id"),
        F.col("n").alias("nb"),
    )
    return (
        na.join(nb, "a_id")
        .join(dots, "a_id", "left")
        .select(
            "a_id", "b_id",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0)) / (F.col("na") * F.col("nb")),
                6,
            ).alias("tf_cos"),
        )
    )


_PHRASE = ("table", "value")


@register(
    "q_phrase_search",
    f"""
    WITH pos AS (
      SELECT doc_id, s['word'] AS tok, s['pos'] AS pos
      FROM (
        SELECT doc_id,
               unnest(list_transform({SQL_TOKS},
                      (w, i) -> {{'word': w, 'pos': i}})) AS s
        FROM documents
      )
    )
    SELECT p1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(p1.pos) AS BIGINT) AS first_pos
    FROM pos p1 JOIN pos p2
      ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
    WHERE p1.tok = '{_PHRASE[0]}' AND p2.tok = '{_PHRASE[1]}'
    GROUP BY p1.doc_id
    """,
)
def q_phrase_search(spark, sf_dir):
    """Exact phrase retrieval ("{0} {1}") over a positional inverted
    index: the two tokens' posting lists (doc_id, pos) equi-join on
    (doc, pos+1). Filters push into the scan BEFORE the join, so the
    join moves only the two tokens' postings — at 100 TB that's the
    standard phrase-query plan, linear in posting length, never in
    corpus length.""".format(*_PHRASE)
    docs = _docs(spark, sf_dir)
    pos = docs.select(
        "doc_id", F.posexplode(tokenize(F.col("text"))).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    p1 = pos.filter(F.col("tok") == _PHRASE[0]).select("doc_id", "pos")
    p2 = pos.filter(F.col("tok") == _PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        p1.join(p2, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


@register(
    "q_sequence_likelihood",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev
      FROM events
    ),
    tr AS (SELECT prev, event_type, CAST(COUNT(*) AS BIGINT) AS c
           FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type),
    tot AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS t FROM tr GROUP BY prev),
    model AS (
      SELECT tr.prev, tr.event_type, ln(tr.c / CAST(tot.t AS DOUBLE)) AS lp
      FROM tr JOIN tot ON tr.prev = tot.prev
    )
    SELECT s.user_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
           ROUND(SUM(m.lp) / COUNT(*), 6) AS avg_ll
    FROM seq s JOIN model m
      ON s.prev = m.prev AND s.event_type = m.event_type
    GROUP BY s.user_id
    """,
)
def q_sequence_likelihood(spark, sf_dir):
    """Sequence typicality: per-user mean log-likelihood of their
    event-type transitions under the corpus MLE Markov model (the
    matrix q_event_transitions estimates). The model is |types|² rows —
    broadcast; scoring is one narrow join + a user-keyed agg. Low
    avg_ll = atypical behavior (bot/anomaly candidates), the sequence
    analogue of q_unigram_logprob's text quality score."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    )
    tr = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = tr.groupBy("prev").agg(F.sum("c").alias("t"))
    model = tr.join(tot, "prev").select(
        "prev", "event_type",
        F.log(F.col("c") / F.col("t").cast("double")).alias("lp"),
    )
    return (
        seq.join(F.broadcast(model), ["prev", "event_type"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_trans"),
            F.round(F.sum("lp") / F.count(F.lit(1)), 6).alias("avg_ll"),
        )
    )
