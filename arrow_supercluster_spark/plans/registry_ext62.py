"""Round-2 registry additions, batch 57 — dedup economics and sampling
bias:

- q_dedup_savings: bytes/tokens removable by exact-duplicate removal,
  per source — the storage/compute savings estimate that justifies the
  dedup pass;
- q_sample_bias: chi-square of the stratified sample's language mix
  against the corpus — does the sampler distort the distribution it
  claims to preserve?
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import pipeline
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_NORM, SQL_TOKS, _docs


@register(
    "q_dedup_savings",
    f"""
    WITH base AS (
      SELECT doc_id, source,
             md5({SQL_NORM}) AS digest,
             length(text) AS n_chars,
             CAST(len(list_filter({SQL_TOKS}, t -> t != '')) AS BIGINT)
               AS n_toks
      FROM documents
    ),
    keep AS (
      SELECT digest, MIN(doc_id) AS keeper FROM base GROUP BY digest
    )
    SELECT b.source,
           COUNT(*) AS n_docs,
           SUM(CASE WHEN b.doc_id <> k.keeper THEN 1 ELSE 0 END) AS n_removable,
           SUM(CASE WHEN b.doc_id <> k.keeper THEN b.n_chars ELSE 0 END)
             AS chars_saved,
           SUM(CASE WHEN b.doc_id <> k.keeper THEN b.n_toks ELSE 0 END)
             AS tokens_saved,
           round(SUM(CASE WHEN b.doc_id <> k.keeper THEN b.n_chars ELSE 0 END)
                 * 1.0 / SUM(b.n_chars), 6) AS byte_fraction_saved
    FROM base b JOIN keep k USING (digest)
    GROUP BY b.source
    """,
)
def q_dedup_savings(spark, sf_dir):
    """Dedup economics — what exact dedup is worth, per source: docs,
    characters, and tokens removable under the min-id keeper policy,
    plus the byte fraction saved — the number that justifies (or kills)
    a dedup pass at acquisition time (training cost is token-linear).
    One digest agg + a digest-keyed join; the text itself never
    shuffles (digests and counts travel)."""
    from arrow_supercluster_spark.operators.dedup import normalize_text, tokenize

    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id", "source",
        F.md5(normalize_text(F.col("text"))).alias("digest"),
        F.length("text").alias("n_chars"),
        F.size(F.filter(tokenize(F.col("text")), lambda t: t != F.lit("")))
        .cast("long")
        .alias("n_toks"),
    )
    keep = base.groupBy("digest").agg(F.min("doc_id").alias("keeper"))
    removable = F.col("doc_id") != F.col("keeper")
    return (
        base.join(keep, "digest")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(removable.cast("int")).alias("n_removable"),
            F.sum(F.when(removable, F.col("n_chars")).otherwise(0)).alias(
                "chars_saved"
            ),
            F.sum(F.when(removable, F.col("n_toks")).otherwise(0)).alias(
                "tokens_saved"
            ),
            F.round(
                F.sum(F.when(removable, F.col("n_chars")).otherwise(0))
                * 1.0
                / F.sum("n_chars"),
                6,
            ).alias("byte_fraction_saved"),
        )
    )


_SB_QUOTA = 25


@register(
    "q_sample_bias",
    f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             (doc_id * {pipeline.HASH_MULT}) % {pipeline.HASH_MOD} AS hkey
      FROM documents
    ),
    sampled AS (
      SELECT lang FROM (
        SELECT lang,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hkey, doc_id)
                 AS rk
        FROM keyed
      ) WHERE rk <= {_SB_QUOTA}
    ),
    corp AS (SELECT lang, COUNT(*) AS n_corpus FROM documents GROUP BY 1),
    smp AS (SELECT lang, COUNT(*) AS n_sample FROM sampled GROUP BY 1),
    tot AS (
      SELECT (SELECT SUM(n_corpus) FROM corp) AS tc,
             (SELECT SUM(n_sample) FROM smp) AS ts
    )
    SELECT c.lang, c.n_corpus, coalesce(s.n_sample, 0) AS n_sample,
           round(coalesce(s.n_sample, 0) * 1.0 / ts, 6) AS sample_share,
           round(c.n_corpus * 1.0 / tc, 6) AS corpus_share,
           round((coalesce(s.n_sample, 0) * 1.0 / ts - c.n_corpus * 1.0 / tc)
                 * (coalesce(s.n_sample, 0) * 1.0 / ts - c.n_corpus * 1.0 / tc)
                 / (c.n_corpus * 1.0 / tc), 9) AS chi2_term
    FROM corp c LEFT JOIN smp s USING (lang) CROSS JOIN tot
    """,
)
def q_sample_bias(spark, sf_dir):
    """Sampling QA — does the fixed-quota stratified sample distort the
    language mix? Per-language sample share vs corpus share with the
    chi-square distortion term — equal quotas per language are maximal
    distortion when the corpus is skewed, and this query is the audit
    that MAKES that visible before a model trains on the sample
    (q_stratified_sample's adversarial reviewer). The sample is the
    same smallest-hash quota rule; shares come from two tiny aggs."""
    docs = _docs(spark, sf_dir)
    keyed = docs.select(
        "doc_id", "lang",
        ((F.col("doc_id") * pipeline.HASH_MULT) % pipeline.HASH_MOD).alias("hkey"),
    )
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    sampled = (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SB_QUOTA)
        .select("lang")
    )
    corp = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_corpus"))
    smp = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sample"))
    tc = docs.count()
    ts_ = sampled.count()
    j = corp.join(smp, "lang", "left").select(
        "lang", "n_corpus", F.coalesce("n_sample", F.lit(0)).alias("n_sample")
    )
    sshare = F.col("n_sample") * 1.0 / F.lit(ts_)
    cshare = F.col("n_corpus") * 1.0 / F.lit(tc)
    return j.select(
        "lang", "n_corpus", "n_sample",
        F.round(sshare, 6).alias("sample_share"),
        F.round(cshare, 6).alias("corpus_share"),
        F.round((sshare - cshare) * (sshare - cshare) / cshare, 9).alias(
            "chi2_term"
        ),
    )
