"""Round-4 registry additions, batch 81 — chunk-level dedup refinements:

- q_cdc_chunks: content-defined chunking (CDC) at the word level — a
  chunk boundary lands after every word whose portable polynomial hash
  ≡ 0 (mod D), so expected chunk length is D words and an insertion
  only perturbs boundaries locally (the rsync/LBFS property fixed-size
  chunking lacks; the dedup granularity CCNet/suffix-array pipelines
  approximate). Emits (doc_id, chunk_idx, n_words, chunk_md5) — the
  chunk-hash table cross-doc dedup then joins on.
- q_idf_weighted_jaccard: weighted Jaccard between adjacent-doc token
  sets with IDF weights (Σ min(w)/Σ max(w) over the token union) — the
  similarity refinement that stops stopword overlap from inflating
  near-dup scores the way unweighted Jaccard (q_jaccard_adjacent) does.

Both oracle-checked: the per-doc chunk window partitions BY doc (frame
bounded by document length); the pair frame is the adjacent-id join.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.operators.dedup import tokenize

_P = 2147483647
_CDC_D = 8  # expected words per chunk


@register(
    "q_cdc_chunks",
    f"""
    WITH words AS (
      SELECT doc_id, s['word'] AS word, s['pos'] AS pos
      FROM (
        SELECT doc_id,
               unnest(list_transform({SQL_TOKS},
                      (w, i) -> {{'word': w, 'pos': i}})) AS s
        FROM documents
      )
    ),
    flagged AS (
      SELECT doc_id, word, pos,
             CASE WHEN list_reduce(
                    list_transform(string_split(word, ''),
                                   c -> CAST(ord(c) AS BIGINT)),
                    (a, b) -> (a * 31 + b) % {_P}) % {_CDC_D} = 0
                  THEN 1 ELSE 0 END AS boundary
      FROM words
    ),
    chunked AS (
      SELECT doc_id, word, pos,
             CAST(coalesce(SUM(boundary) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS chunk_idx
      FROM flagged
    )
    SELECT doc_id, chunk_idx,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_md5
    FROM chunked GROUP BY doc_id, chunk_idx
    """,
)
def q_cdc_chunks(spark, sf_dir):
    """Chunk-level dedup prep — content-defined chunking: the boundary
    test is the portable polynomial word hash mod D (identical fold on
    both engines), the chunk index is an exclusive per-doc prefix sum
    (window PARTITIONED by doc_id — frame bounded by doc length), and
    each chunk emits its word count + md5 over the space-joined words.
    Deterministic, locality-preserving (an edit only re-cuts its own
    neighborhood), and the chunk_md5 table is what cross-corpus chunk
    dedup (q_chunk_dedup's granularity) equi-joins on."""
    docs = _docs(spark, sf_dir)
    words = docs.select(
        "doc_id",
        F.posexplode(tokenize(F.col("text"))).alias("pos0", "word"),
    ).select("doc_id", "word", (F.col("pos0") + 1).alias("pos"))
    codes = F.transform(
        F.split(F.col("word"), ""), lambda c: F.ascii(c).cast("long")
    )
    poly = F.aggregate(
        F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0))),
        F.element_at(codes, 1),
        lambda a, b: (a * 31 + b) % _P,
    )
    flagged = words.select(
        "doc_id", "word", "pos",
        F.when(poly % _CDC_D == 0, 1).otherwise(0).alias("boundary"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = flagged.select(
        "doc_id", "word", "pos",
        F.coalesce(F.sum("boundary").over(w), F.lit(0))
        .cast("long")
        .alias("chunk_idx"),
    )
    return chunked.groupBy("doc_id", "chunk_idx").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "word"))
                    ),
                    lambda s: s["word"],
                ),
                " ",
            )
        ).alias("chunk_md5"),
    )


@register(
    "q_idf_weighted_jaccard",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({SQL_TOKS})) AS tok
      FROM documents
    ),
    n_docs AS (SELECT COUNT(*) AS n FROM documents),
    idf AS (
      SELECT tok,
             ln((SELECT n FROM n_docs) * 1.0 / COUNT(*)) AS w
      FROM toks GROUP BY tok
    ),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             coalesce(ta.present, 0) AS in_a,
             coalesce(tb.present, 0) AS in_b,
             i.tok, i.w
      FROM documents a
      JOIN documents b ON b.doc_id = a.doc_id + 1
      JOIN idf i ON TRUE
      LEFT JOIN (SELECT doc_id, tok, 1 AS present FROM toks) ta
        ON ta.doc_id = a.doc_id AND ta.tok = i.tok
      LEFT JOIN (SELECT doc_id, tok, 1 AS present FROM toks) tb
        ON tb.doc_id = b.doc_id AND tb.tok = i.tok
      WHERE coalesce(ta.present, 0) + coalesce(tb.present, 0) > 0
    )
    SELECT a_id, b_id,
           round(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN w ELSE 0 END)
                 / SUM(w), 6) AS w_jaccard
    FROM pairs GROUP BY a_id, b_id
    """,
)
def q_idf_weighted_jaccard(spark, sf_dir):
    """Near-dup refinement — IDF-weighted Jaccard over adjacent-doc
    token sets: Σ_{{tok ∈ A∩B}} idf / Σ_{{tok ∈ A∪B}} idf. Rare-token
    overlap dominates; shared stopwords (w = ln(N/df) → 0 as df → N)
    stop inflating similarity the way they do in the unweighted
    q_jaccard_adjacent. Shape: the distinct-token explode is the only
    corpus-sized frame; IDF joins by token (AQE broadcasts the
    vocabulary-sized side); the pair frame is the adjacent-id
    self-join."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokenize(F.col("text")))).alias("tok"),
    )
    n = docs.count()
    idf = toks.groupBy("tok").agg(
        F.log(F.lit(float(n)) / F.count(F.lit(1))).alias("w")
    )
    a = toks.select(F.col("doc_id").alias("a_id"), "tok")
    b = toks.select((F.col("doc_id") - 1).alias("a_id"), "tok")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    union = (
        a.filter(F.col("a_id") < max_id)
        .withColumn("in_a", F.lit(1))
        .join(
            b.filter(F.col("a_id") >= 0).withColumn("in_b", F.lit(1)),
            ["a_id", "tok"],
            "full",
        )
        .select(
            "a_id", "tok",
            F.coalesce(F.col("in_a"), F.lit(0)).alias("in_a"),
            F.coalesce(F.col("in_b"), F.lit(0)).alias("in_b"),
        )
    )
    pairs = union.join(idf, "tok")
    return (
        pairs.groupBy("a_id")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        (F.col("in_a") == 1) & (F.col("in_b") == 1),
                        F.col("w"),
                    ).otherwise(0.0)
                )
                / F.sum("w"),
                6,
            ).alias("w_jaccard")
        )
        .select(
            "a_id", (F.col("a_id") + 1).alias("b_id"), "w_jaccard"
        )
    )
