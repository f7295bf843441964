"""Round-8 registry additions, batch 209 — text-generation diversity
diagnostics (the metrics a generation-quality dashboard reads before
any model-based score):

- q_distinct_n: distinct-1 / distinct-2 (Li et al. 2016) per source —
  unique n-grams over total n-grams; low distinct-2 is THE degenerate-
  repetition signature in sampled generations.
- q_type_token: lexical-diversity family per source — plain TTR,
  Guiraud's root TTR (types/√tokens) and Herdan's C (log types / log
  tokens), the two classic length-corrected variants.
- q_bigram_entropy: bigram conditional entropy H(w₂|w₁) per source —
  next-token predictability; the text analog of the event-stream
  entropy rate (q_entropy_rate) and the sequential complement of the
  per-doc unigram entropy (q_token_entropy).  Low = template text.

At 100 TB: all three are explode → hash-aggregate shapes (map-side
combine, every join keyed); distinct counts are
per-(source, gram) aggs — the same postings discipline as the token
stats family (E4).  No driver state beyond literals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

def _bigrams(toks):
    """Adjacent token bigrams 'a b' (JVM-side; <2-token docs get none)."""
    n = F.size(toks)
    return F.when(n < 2, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1),
                                  F.element_at(toks, i + 2)),
        )
    )


_SQL_BIGRAMS = (
    f"CASE WHEN len({SQL_TOKS}) < 2 THEN [] "
    f"ELSE list_transform(range(1, len({SQL_TOKS})), "
    f"i -> {SQL_TOKS}[i] || ' ' || {SQL_TOKS}[i + 1]) END"
)


@register(
    "q_distinct_n",
    f"""
    WITH uni AS (
      SELECT source, unnest({SQL_TOKS}) AS g FROM documents
    ),
    bi AS (
      SELECT source, unnest({_SQL_BIGRAMS}) AS g FROM documents
    ),
    u AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS d1
      FROM uni WHERE g != '' GROUP BY source
    ),
    b AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS d2
      FROM bi GROUP BY source
    )
    SELECT u.source, u.n1 AS unigrams, u.d1 AS distinct_unigrams,
           round(u.d1 * 1.0 / u.n1, 6) AS distinct_1,
           b.n2 AS bigrams, b.d2 AS distinct_bigrams,
           round(b.d2 * 1.0 / b.n2, 6) AS distinct_2
    FROM u JOIN b ON b.source = u.source
    ORDER BY u.source
    """,
)
def q_distinct_n(spark, sf_dir):
    """R620 — distinct-1/distinct-2 per source: unique-over-total
    n-gram ratios (Li et al. 2016), the standard degenerate-repetition
    screen for sampled text.  Two explode→agg passes (unigram, bigram),
    each a (source, gram)-keyed distinct count with map-side combine —
    the E4 postings shape at any corpus size."""
    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))
    uni = (
        docs.select("source", F.explode(toks).alias("g"))
        .filter(F.col("g") != "")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("unigrams"),
            F.countDistinct("g").alias("distinct_unigrams"),
        )
    )
    bi = (
        docs.select("source", F.explode(_bigrams(toks)).alias("g"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("bigrams"),
            F.countDistinct("g").alias("distinct_bigrams"),
        )
    )
    return (
        uni.join(bi, "source")
        .select(
            "source", "unigrams", "distinct_unigrams",
            F.round(
                F.col("distinct_unigrams") * 1.0 / F.col("unigrams"), 6
            ).alias("distinct_1"),
            "bigrams", "distinct_bigrams",
            F.round(
                F.col("distinct_bigrams") * 1.0 / F.col("bigrams"), 6
            ).alias("distinct_2"),
        )
        .orderBy("source")
    )


@register(
    "q_type_token",
    f"""
    WITH uni AS (
      SELECT source, unnest({SQL_TOKS}) AS g FROM documents
    ),
    s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS tokens,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS types
      FROM uni WHERE g != '' GROUP BY source
    )
    SELECT source, tokens, types,
           round(types * 1.0 / tokens, 6) AS ttr,
           round(types / sqrt(tokens), 6) AS root_ttr,
           round(ln(types) / ln(tokens), 6) AS herdan_c
    FROM s ORDER BY source
    """,
)
def q_type_token(spark, sf_dir):
    """R621 — lexical diversity per source: TTR = types/tokens plus the
    two classic length corrections (Guiraud root TTR = types/√tokens,
    Herdan's C = ln types / ln tokens) — raw TTR falls mechanically
    with corpus size, so the corrected forms are what's comparable
    across sources.  One explode → one agg."""
    docs = _docs(spark, sf_dir)
    s = (
        docs.select("source", F.explode(tokenize(F.col("text"))).alias("g"))
        .filter(F.col("g") != "")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("tokens"),
            F.countDistinct("g").alias("types"),
        )
    )
    return s.select(
        "source", "tokens", "types",
        F.round(F.col("types") * 1.0 / F.col("tokens"), 6).alias("ttr"),
        F.round(F.col("types") / F.sqrt("tokens"), 6).alias("root_ttr"),
        F.round(F.log("types") / F.log("tokens"), 6).alias("herdan_c"),
    ).orderBy("source")


@register(
    "q_bigram_entropy",
    f"""
    WITH bi AS (
      SELECT source, unnest({_SQL_BIGRAMS}) AS g FROM documents
    ),
    split AS (
      SELECT source, string_split(g, ' ')[1] AS w1, g,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM bi GROUP BY 1, 2, 3
    ),
    w1tot AS (
      SELECT source, w1, SUM(c) AS t FROM split GROUP BY 1, 2
    ),
    n AS (SELECT source, SUM(c) AS total FROM split GROUP BY 1),
    h AS (
      SELECT s.source,
             SUM((s.c * 1.0 / n.total)
                 * ln(w1tot.t * 1.0 / s.c)) AS h_cond
      FROM split s
      JOIN w1tot ON w1tot.source = s.source AND w1tot.w1 = s.w1
      JOIN n ON n.source = s.source
      GROUP BY s.source
    )
    SELECT h.source, CAST(n.total AS BIGINT) AS bigrams,
           round(h.h_cond, 6) AS cond_entropy_nats,
           round(h.h_cond / ln(2), 6) AS cond_entropy_bits
    FROM h JOIN n ON n.source = h.source
    ORDER BY h.source
    """,
)
def q_bigram_entropy(spark, sf_dir):
    """R622 — bigram conditional entropy per source:
    H(w₂|w₁) = Σ_{{w₁,w₂}} p(w₁,w₂) · ln(c(w₁)/c(w₁,w₂)) — how
    predictable the next token is given the current one; the text
    analog of the event-stream entropy rate (q_entropy_rate) and the
    sequential complement of per-doc unigram entropy (q_token_entropy).
    Low values flag template/boilerplate corpora that unigram stats
    miss.  Two (source, gram)-keyed aggs + one keyed join — the E4
    postings shape; nothing global."""
    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))
    split = (
        docs.select("source", F.explode(_bigrams(toks)).alias("g"))
        .select(
            "source",
            F.split(F.col("g"), " ").getItem(0).alias("w1"),
            "g",
        )
        .groupBy("source", "w1", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w1tot = split.groupBy("source", "w1").agg(F.sum("c").alias("t"))
    n = split.groupBy("source").agg(F.sum("c").alias("total"))
    h = (
        split.join(w1tot, ["source", "w1"])
        .join(n, "source")
        .groupBy("source", "total")
        .agg(
            F.sum(
                (F.col("c") * 1.0 / F.col("total"))
                * F.log(F.col("t") * 1.0 / F.col("c"))
            ).alias("h_cond")
        )
    )
    return h.select(
        "source",
        F.col("total").alias("bigrams"),
        F.round("h_cond", 6).alias("cond_entropy_nats"),
        F.round(F.col("h_cond") / F.log(F.lit(2.0)), 6).alias(
            "cond_entropy_bits"
        ),
    ).orderBy("source")
