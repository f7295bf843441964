"""Round-8 registry additions, batch 215 — language-model smoothing
completions (beside the existing q_kneser_ney / q_good_turing /
q_unigram_logprob):

- q_witten_bell: Witten-Bell smoothed bigram LM — λ(w₁) =
  c(w₁)/(c(w₁)+T(w₁)) with T = distinct-follower count, interpolated
  with the unigram ML; emitted for the top bigrams (deterministic
  cut).  The diversity-aware interpolation weight is THE WB idea:
  contexts with many distinct followers trust their ML less.
- q_oov_rate: per-source out-of-vocabulary rate against the union of
  the OTHER sources' vocabularies — token-level and type-level OOV;
  the train/eval vocabulary-transfer diagnostic a data-mix decision
  reads.
- q_stupid_backoff: per-source mean log stupid-backoff score of the
  source's bigram stream under the GLOBAL counts (S = ML bigram if
  seen, else 0.4·unigram ML), plus the backoff rate — the cheap
  pseudo-perplexity that ranks sources by typicality.

At 100 TB: everything is (gram)-keyed hash aggs + broadcast-sized
joins of context/unigram stat tables; the per-source scoring is one
keyed join over the bigram stream.  No driver state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.plans.registry_ext214 import (
    _SQL_BIGRAMS,
    _bigrams,
)

_WB_TOP = 20
_SB_ALPHA = 0.4

_SQL_BI_STREAM = f"""
    bi AS MATERIALIZED (
      SELECT source, string_split(g, ' ')[1] AS w1,
             string_split(g, ' ')[2] AS w2
      FROM (SELECT source, unnest({_SQL_BIGRAMS}) AS g FROM documents)
    ),
    uni AS MATERIALIZED (
      SELECT g AS w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest({SQL_TOKS}) AS g FROM documents)
      WHERE g != '' GROUP BY g
    ),
    n AS (SELECT SUM(c) AS total FROM uni),
    bic AS MATERIALIZED (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bi GROUP BY 1, 2
    ),
    ctx AS MATERIALIZED (
      SELECT w1, SUM(c) AS cw, CAST(COUNT(*) AS BIGINT) AS t
      FROM bic GROUP BY 1
    )"""


# NO broadcast hints on uni/bic/ctx joins: those tables are DATA-SIZED
# (vocab and distinct-bigram counts grow with the corpus — the r9 16×
# sweep caught q_stupid_backoff's pinned F.broadcast(bic) building a
# 16×-grown broadcast table until the 240 s watchdog fired).  AQE
# broadcasts them when they measure small and shuffles when they don't —
# exactly the adaptive behavior a 100 TB corpus needs.  Only the 1-row
# total (n) keeps an explicit hint.
def _spark_bi_stream(spark, sf_dir):
    """r10 (guide §2.3 "aggregate before you shuffle"): the raw bigram
    stream is collapsed to (source, w1, w2, cnt) in ONE pass and
    materialized — previously `bi` (the full exploded occurrence
    stream) was evaluated once per consumer (the bic aggregation AND
    the scoring stream side each re-ran tokenize+explode over the whole
    corpus), and the scoring joins carried one row per OCCURRENCE
    instead of one per distinct (source, bigram).  Downstream means are
    cnt-weighted — identical values, occurrence grain recoverable.
    Returns (bis, uni, bic, ctx); `bis` carries `cnt`."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))
    bis = truncate(
        docs.select("source", F.explode(_bigrams(toks)).alias("g"))
        .select(
            "source",
            F.split("g", " ").getItem(0).alias("w1"),
            F.split("g", " ").getItem(1).alias("w2"),
        )
        .groupBy("source", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bic = bis.groupBy("w1", "w2").agg(F.sum("cnt").alias("c"))
    ctx = bic.groupBy("w1").agg(
        F.sum("c").alias("cw"), F.count(F.lit(1)).alias("t")
    )
    return bis, uni, bic, ctx


@register(
    "q_witten_bell",
    f"""
    WITH {_SQL_BI_STREAM}
    SELECT bic.w1, bic.w2, bic.c AS c_bigram,
           round(ctx.cw / (ctx.cw + ctx.t * 1.0), 6) AS lambda_w1,
           round((ctx.cw / (ctx.cw + ctx.t * 1.0)) * (bic.c * 1.0 / ctx.cw)
                 + (1.0 - ctx.cw / (ctx.cw + ctx.t * 1.0))
                   * (uni.c * 1.0 / n.total), 6) AS p_wb
    FROM bic
    JOIN ctx ON ctx.w1 = bic.w1
    JOIN uni ON uni.w = bic.w2
    CROSS JOIN n
    ORDER BY bic.c DESC, bic.w1, bic.w2
    LIMIT {_WB_TOP}
    """,
)
def q_witten_bell(spark, sf_dir):
    """R638 — Witten-Bell interpolated bigram probabilities for the top
    {t} bigrams: λ(w₁) = c(w₁)/(c(w₁)+T(w₁)) where T counts DISTINCT
    followers, P_WB = λ·ML(w₂|w₁) + (1−λ)·ML(w₂).  Contexts with
    diverse continuations shrink toward the unigram — the
    diversity-aware cousin of q_kneser_ney's continuation counts.
    Three keyed aggs + two broadcast joins.""".format(t=_WB_TOP)
    _, uni, bic, ctx = _spark_bi_stream(spark, sf_dir)
    n = uni.agg(F.sum("c").alias("total"))
    lam = F.col("cw") / (F.col("cw") + F.col("t") * 1.0)
    return (
        bic.join(ctx, "w1")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("cu")),
            "w2",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "w1", "w2",
            F.col("c").alias("c_bigram"),
            F.round(lam, 6).alias("lambda_w1"),
            F.round(
                lam * (F.col("c") * 1.0 / F.col("cw"))
                + (1.0 - lam) * (F.col("cu") * 1.0 / F.col("total")),
                6,
            ).alias("p_wb"),
        )
        .orderBy(F.desc("c_bigram"), "w1", "w2")
        .limit(_WB_TOP)
    )


@register(
    "q_oov_rate",
    f"""
    WITH toks AS MATERIALIZED (
      SELECT source, g AS w
      FROM (SELECT source, unnest({SQL_TOKS}) AS g FROM documents)
      WHERE g != ''
    ),
    counts AS MATERIALIZED (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ),
    owner AS MATERIALIZED (
      SELECT w, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_src,
             MIN(source) AS only_src
      FROM counts GROUP BY w
    )
    SELECT counts.source,
           CAST(SUM(counts.c) AS BIGINT) AS tokens,
           CAST(COUNT(*) AS BIGINT) AS types,
           CAST(SUM(CASE WHEN owner.n_src = 1 THEN counts.c ELSE 0 END)
                AS BIGINT) AS oov_tokens,
           CAST(SUM(CASE WHEN owner.n_src = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS oov_types,
           round(SUM(CASE WHEN owner.n_src = 1 THEN counts.c ELSE 0 END)
                 * 1.0 / SUM(counts.c), 6) AS oov_token_rate,
           round(SUM(CASE WHEN owner.n_src = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS oov_type_rate
    FROM counts JOIN owner ON owner.w = counts.w
    GROUP BY counts.source
    ORDER BY counts.source
    """,
)
def q_oov_rate(spark, sf_dir):
    """R639 — per-source OOV rate against the union of the OTHER
    sources' vocabularies: a token of source s is OOV iff its type
    appears in NO other source (single-owner types), measured at token
    and type grain.  The vocabulary-transfer diagnostic behind
    train/eval mix decisions — high OOV sources need their own
    representation budget.  Two keyed aggs + one join on the vocab
    frame."""
    docs = _docs(spark, sf_dir)
    toks = (
        docs.select(
            "source", F.explode(tokenize(F.col("text"))).alias("w")
        )
        .filter(F.col("w") != "")
    )
    counts = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    owner = counts.groupBy("w").agg(
        F.countDistinct("source").alias("n_src")
    )
    j = counts.join(owner, "w")
    oov = F.when(F.col("n_src") == 1, 1).otherwise(0)
    return (
        j.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("tokens"),
            F.count(F.lit(1)).alias("types"),
            F.sum(F.col("c") * oov).cast("long").alias("oov_tokens"),
            F.sum(oov).cast("long").alias("oov_types"),
            F.round(
                F.sum(F.col("c") * oov) * 1.0 / F.sum("c"), 6
            ).alias("oov_token_rate"),
            F.round(F.sum(oov) * 1.0 / F.count(F.lit(1)), 6).alias(
                "oov_type_rate"
            ),
        )
        .orderBy("source")
    )


@register(
    "q_stupid_backoff",
    f"""
    WITH {_SQL_BI_STREAM},
    scored AS (
      SELECT bi.source,
             CASE WHEN bic.c IS NOT NULL
                  THEN ln(bic.c * 1.0 / ctx.cw)
                  ELSE ln({_SB_ALPHA} * (uni.c * 1.0 / n.total)) END AS s,
             CASE WHEN bic.c IS NOT NULL THEN 0 ELSE 1 END AS backed
      FROM bi
      LEFT JOIN bic ON bic.w1 = bi.w1 AND bic.w2 = bi.w2
      LEFT JOIN ctx ON ctx.w1 = bi.w1
      JOIN uni ON uni.w = bi.w2
      CROSS JOIN n
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS bigrams,
           round(AVG(s), 6) AS mean_log_score,
           round(AVG(backed * 1.0), 6) AS backoff_rate
    FROM scored GROUP BY source ORDER BY source
    """,
)
def q_stupid_backoff(spark, sf_dir):
    """R640 — per-source mean log stupid-backoff score under the GLOBAL
    bigram counts: S(w₂|w₁) = c(w₁w₂)/c(w₁) when seen, else
    α·c(w₂)/N with α={a} — the un-normalized backoff that large-scale
    LMs actually shipped; the per-source mean log score is a cheap
    pseudo-perplexity (typicality) and backoff_rate its OOV-transition
    share.  NOTE: scored against counts that include the source itself
    (the corpus-LM convention here, stated); q_oov_rate is the
    leave-one-source-out view.  One stream join against two broadcast
    stat tables.""".format(a=_SB_ALPHA)
    bis, uni, bic, ctx = _spark_bi_stream(spark, sf_dir)
    n = uni.agg(F.sum("c").alias("total"))
    # r10: joins run at (source, bigram) grain with cnt weights — the
    # occurrence stream never re-materializes; means weight by cnt
    # (identical values at the 6dp budget, same convention as every
    # other grouped-mean in the registry).
    scored = (
        bis.join(bic, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c").alias("cu")),
            "w2",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "cnt",
            F.when(
                F.col("c").isNotNull(),
                F.log(F.col("c") * 1.0 / F.col("cw")),
            )
            .otherwise(
                F.log(_SB_ALPHA * (F.col("cu") * 1.0 / F.col("total")))
            )
            .alias("s"),
            F.when(F.col("c").isNotNull(), 0).otherwise(1).alias("backed"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.sum("cnt").alias("bigrams"),
            F.round(
                F.sum(F.col("cnt") * F.col("s")) / F.sum("cnt"), 6
            ).alias("mean_log_score"),
            F.round(
                F.sum(F.col("cnt") * F.col("backed") * 1.0) / F.sum("cnt"),
                6,
            ).alias("backoff_rate"),
        )
        .orderBy("source")
    )
