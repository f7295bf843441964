"""Round-2 registry additions, batch 2: corpus hygiene (benchmark
decontamination, PII redaction, repetition quality) and embedding
centroid operators. All fully oracle-checked — n-grams and redaction are
deterministic string work, centroids are rounded before hashing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import centroids, decontam
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import (
    SQL_TOKS,
    _docs,
    _emb,
)

_NGRAM = 8
_EVAL_MOD = 29  # doc_id % 29 == 0 plays the held-out benchmark set

# DuckDB twin of decontam.doc_ngram_digests: distinct md5'd word 8-grams
_SQL_GRAMS = f"""
    SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, len(toks) - {_NGRAM} + 1),
             i -> md5(array_to_string(toks[i:i+{_NGRAM}-1], ' '))))) AS g
    FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents) t
    WHERE len(toks) >= {_NGRAM}
"""


@register(
    "q_decontaminate",
    f"""
    WITH grams AS ({_SQL_GRAMS}),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0
    )
    SELECT d.doc_id, COUNT(*) AS n_overlap
    FROM grams d JOIN eval_grams e USING (g)
    WHERE d.doc_id % {_EVAL_MOD} <> 0
    GROUP BY 1
    """,
)
def q_decontaminate(spark, sf_dir):
    """Pipeline — benchmark decontamination (GPT-2/3-style word-8-gram
    overlap): training docs sharing any 8-gram with the eval slice
    (doc_id % 29 == 0), with overlap counts. Eval n-gram set is broadcast
    (benchmarks are tiny by nature) so the corpus side never shuffles;
    md5 digests cross the wire, never text."""
    return decontam.decontaminate(
        _docs(spark, sf_dir),
        eval_pred=F.col("doc_id") % _EVAL_MOD == 0,
        n=_NGRAM,
    )


# deterministic PII injection so the scrub has real work on synthetic text
_SQL_PII_TEXT = f"""
    CASE WHEN doc_id % 7 = 0 THEN
           text || ' contact user' || doc_id || '@example.com or 555-010-' ||
           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END
"""


@register(
    "q_pii_scrub",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(t, '{decontam.EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(
               regexp_replace(t, '{decontam.EMAIL_RE}', '<EMAIL>', 'g'),
               '{decontam.PHONE_RE}')) AS n_phones,
           md5(regexp_replace(
               regexp_replace(t, '{decontam.EMAIL_RE}', '<EMAIL>', 'g'),
               '{decontam.PHONE_RE}', '<PHONE>', 'g')) AS scrub_hash
    FROM (SELECT doc_id, {_SQL_PII_TEXT} AS t FROM documents) src
    """,
)
def q_pii_scrub(spark, sf_dir):
    """Pipeline — PII redaction: emails and phone numbers replaced with
    typed placeholders, per-doc redaction counts for auditing. PII is
    injected deterministically (doc_id % 7) since the synthetic corpus
    has none. Narrow pure-JVM regex map — identical RE syntax runs on
    the DuckDB side, and the scrubbed text is hash-compared."""
    docs = _docs(spark, sf_dir).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.com or 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")),
    )
    out = decontam.pii_scrub(docs)
    return out.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.md5("scrubbed_text").alias("scrub_hash"),
    )


@register(
    "q_repetition_stats",
    f"""
    WITH sent AS (
      SELECT doc_id,
             len(string_split_regex(text, '\\. ')) AS n_sents,
             round(1.0 - len(list_distinct(string_split_regex(text, '\\. ')))
                   * 1.0 / greatest(len(string_split_regex(text, '\\. ')), 1),
                   6) AS dup_sent_frac
      FROM documents
    ),
    tok AS (
      SELECT doc_id, round(MAX(cnt) * 1.0 / SUM(cnt), 6) AS top_tok_frac,
             SUM(cnt) AS n_tokens
      FROM (
        SELECT doc_id, tok, COUNT(*) AS cnt FROM (
          SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents
        ) GROUP BY 1, 2
      ) GROUP BY 1
    )
    SELECT s.doc_id, s.n_sents, s.dup_sent_frac, t.n_tokens, t.top_tok_frac,
           (s.dup_sent_frac > 0.3 OR t.top_tok_frac > 0.2) AS repetitive
    FROM sent s JOIN tok t USING (doc_id)
    """,
)
def q_repetition_stats(spark, sf_dir):
    """Pipeline — repetition quality signals (Gopher §A1.1-style):
    duplicate-sentence fraction (narrow HOF exprs) + most-frequent-token
    fraction (explode + doc-keyed agg, the scalable form), flagged
    against the published-style thresholds."""
    return decontam.repetition_stats(_docs(spark, sf_dir))


@register(
    "q_label_centroids",
    """
    SELECT label, CAST(COUNT(DISTINCT pos) AS BIGINT) AS dim,
           array_to_string(
             list(CAST(CAST(av AS DECIMAL(38,6)) AS VARCHAR) ORDER BY pos),
             ',') AS centroid
    FROM (
      SELECT label, pos, round(AVG(v), 6) AS av FROM (
        SELECT label,
               unnest(embedding) AS v,
               unnest(generate_series(0, len(embedding) - 1)) AS pos
        FROM embeddings
      ) x GROUP BY 1, 2
    ) y GROUP BY 1
    """,
)
def q_label_centroids(spark, sf_dir):
    """Embedding ops — per-label mean vector (the reference's weighted
    centroid A2, generalized to d dims): posexplode + (label, pos) agg =
    one shuffle of scalars with map-side combine; components rounded so
    cross-engine hashes agree.  The vector travels as a comma-joined
    DECIMAL(38,6) string: the driver's pandas canonicalizer cannot hash
    list cells (CORRECTNESS_r10 err; VERDICT r10 #1), and the fixed-scale
    decimal rendering is bit-identical across Spark and DuckDB where raw
    double→string shortest-round-trip notation is not."""
    cents = centroids.label_centroids(_emb(spark, sf_dir))
    return cents.select(
        "label",
        "dim",
        F.array_join(
            F.transform(
                "centroid", lambda v: v.cast("decimal(38,6)").cast("string")
            ),
            ",",
        ).alias("centroid"),
    )


@register(
    "q_nearest_centroid",
    """
    WITH cents AS (
      SELECT label AS c_label, list(av ORDER BY pos) AS centroid
      FROM (
        SELECT label, pos, round(AVG(v), 6) AS av FROM (
          SELECT label,
                 unnest(embedding) AS v,
                 unnest(generate_series(0, len(embedding) - 1)) AS pos
          FROM embeddings
        ) x GROUP BY 1, 2
      ) y GROUP BY 1
    ),
    scored AS (
      SELECT e.vec_id, e.label, c.c_label,
             round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid)
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(c.centroid, c.centroid))),
                   6) AS sim
      FROM embeddings e CROSS JOIN cents c
    ),
    best AS (
      SELECT vec_id, label, c_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, c_label) AS rk
      FROM scored
    )
    SELECT label, c_label AS assigned, COUNT(*) AS n_vecs
    FROM best WHERE rk = 1 GROUP BY 1, 2
    """,
)
def q_nearest_centroid(spark, sf_dir):
    """Embedding ops — nearest-centroid assignment (cosine, label
    tiebreak) returning the (true, assigned) confusion counts. Spark side
    is broadcast-centroids + partial-aggregable min(struct(-sim, label))
    — no per-vector window, no corpus shuffle; the DuckDB twin uses the
    naive window form, differentially checking the argmax rewrite."""
    emb = _emb(spark, sf_dir)
    return centroids.nearest_centroid(
        emb, centroids.label_centroids(emb)
    )
