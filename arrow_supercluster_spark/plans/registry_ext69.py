"""Round-2 registry additions, batch 64 — unseen-mass estimation over
the corpus vocabulary:

- q_chao1_vocab: the Chao1 estimate of TOTAL vocabulary size (observed
  + unseen) from hapax/doubleton counts — how much vocabulary the
  corpus hasn't shown yet;
- q_missing_mass: the Good-Turing missing-mass estimate P(next token
  is unseen) = hapax occurrences / total tokens — the OOV-risk number
  for any model trained on this corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_SQL_COUNTS = f"""
    counts AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest({SQL_TOKS}) AS tok FROM documents)
      WHERE tok != '' GROUP BY 1
    )
"""


@register(
    "q_chao1_vocab",
    f"""
    WITH {_SQL_COUNTS}
    SELECT COUNT(*) AS v_obs,
           SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
           SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2,
           CASE WHEN SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) > 0
                THEN round(COUNT(*)
                     + SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                       * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                       / (2.0 * SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)), 6)
                ELSE round(COUNT(*)
                     + SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                       * (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1) / 2.0, 6)
                END AS chao1
    FROM counts
    """,
)
def q_chao1_vocab(spark, sf_dir):
    """Corpus estimation — Chao1 richness: V̂ = V_obs + F₁²/(2F₂)
    (hapax² over twice the doubletons; the bias-corrected form when
    F₂ = 0) — the classic capture-recapture estimate of how much
    VOCABULARY the corpus hasn't shown yet, i.e. whether more data will
    still buy new types (the asymptote q_heaps_law's curve bends
    toward). One token agg, a 1-row frequency-of-frequency summary."""
    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    f1 = F.sum((F.col("c") == 1).cast("int"))
    f2 = F.sum((F.col("c") == 2).cast("int"))
    v = F.count(F.lit(1))
    return counts.agg(
        v.alias("v_obs"),
        f1.alias("f1"),
        f2.alias("f2"),
        F.when(f2 > 0, F.round(v + f1 * f1 / (2.0 * f2), 6))
        .otherwise(F.round(v + f1 * (f1 - 1) / 2.0, 6))
        .alias("chao1"),
    )


@register(
    "q_missing_mass",
    f"""
    WITH {_SQL_COUNTS}
    SELECT SUM(c) AS n_tokens,
           SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
           round(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / SUM(c), 6)
             AS missing_mass,
           round(1.0 - SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1.0 / SUM(c), 6)
             AS coverage
    FROM counts
    """,
)
def q_missing_mass(spark, sf_dir):
    """Corpus estimation — Good-Turing missing mass: P(the next token is
    a type never seen) ≈ F₁/N (hapax occurrences over total tokens),
    and its complement, the Good-Turing coverage — the OOV-risk number
    that says whether a tokenizer/LM trained here will keep meeting new
    words (the probabilistic face of q_chao1_vocab's count). Same
    one-agg shape."""
    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    f1 = F.sum((F.col("c") == 1).cast("int"))
    n = F.sum("c")
    return counts.agg(
        n.alias("n_tokens"),
        f1.alias("f1"),
        F.round(f1 * 1.0 / n, 6).alias("missing_mass"),
        F.round(1.0 - f1 * 1.0 / n, 6).alias("coverage"),
    )
