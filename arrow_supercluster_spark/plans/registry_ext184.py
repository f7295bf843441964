"""Round-7 registry additions, batch 179 — distribution-drift
divergences and basket mining (the data-mix diagnostics family,
completing PSI/KL/Wasserstein already registered):

- q_js_divergence: Jensen-Shannon divergence of each source's token
  unigram distribution against the corpus distribution — THE
  symmetric, bounded (≤ ln 2) "which source is off-distribution"
  score a data-mix dashboard ranks sources by.  Zero-frequency terms
  contribute 0 exactly (no smoothing needed: the mixture M is
  positive wherever P or Q is).
- q_hellinger_tvd: Hellinger distance and total-variation distance
  over the same per-source-vs-corpus pairs — the two metrics with
  direct coupling/testing interpretations (TVD = max event
  probability gap; Hellinger² bounds TVD both ways).
- q_frequent_itemsets: apriori over user event-type baskets —
  singleton and pair supports, and every A→B rule with support,
  confidence and lift.  The 5-type domain makes level-2 apriori
  EXACT and bounded (C(5,2) = 10 pairs); the distributed work is one
  distinct (user, type) collapse and one within-user self-join.

At 100 TB: the divergences collapse the corpus to (source, token)
count frames (one shuffle each, partial-aggregated) and the final
sums are vocabulary-keyed; the basket miner shuffles the distinct
(user, type) frame once — pair expansion is per-user-bounded (≤ C(T,2)
rows per user), never a cross-user product.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

_SQL_TOK_COUNTS = f"""
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, unnest({SQL_TOKS}) AS tok FROM documents)
      GROUP BY 1, 2
"""


def _tok_counts(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .select(
            "source", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


# ===========================================================================
# R537 — Jensen-Shannon divergence, source vs corpus
# ===========================================================================

@register(
    "q_js_divergence",
    f"""
    WITH tc AS ({_SQL_TOK_COUNTS}),
    corp AS (SELECT tok, SUM(c) AS cc FROM tc GROUP BY 1),
    tots AS (
      SELECT s.source, s.st, (SELECT SUM(cc) FROM corp) AS ct
      FROM (SELECT source, SUM(c) AS st FROM tc GROUP BY 1) s
    ),
    terms AS (
      SELECT t.source,
             tc.c * 1.0 / t.st AS p,
             corp.cc * 1.0 / t.ct AS q
      FROM corp
      CROSS JOIN tots t
      LEFT JOIN tc ON tc.source = t.source AND tc.tok = corp.tok
    )
    SELECT source,
           round(SUM(CASE WHEN p > 0
                          THEN 0.5 * p * ln(p / (0.5 * p + 0.5 * q))
                          ELSE 0 END)
                 + SUM(0.5 * q * ln(q / (0.5 * COALESCE(p, 0)
                                         + 0.5 * q))), 6) AS jsd,
           round(SUM(CASE WHEN p > 0
                          THEN 0.5 * p * ln(p / (0.5 * p + 0.5 * q))
                          ELSE 0 END)
                 + SUM(0.5 * q * ln(q / (0.5 * COALESCE(p, 0)
                                         + 0.5 * q))), 6) / ln(2)
             <= 1.0001 AS within_bound
    FROM terms GROUP BY source ORDER BY source
    """,
)
def q_js_divergence(spark, sf_dir):
    """R537 — per-source JSD against the corpus token distribution:
    0.5·KL(P‖M) + 0.5·KL(Q‖M), M the even mixture.  The corpus frame
    left-joins each source's counts so q>0 always holds and p=0 terms
    contribute only through the Q half — exact, smoothing-free.
    Ratios divide identical BIGINT sums; ln sees bit-identical inputs;
    the ≤ ln 2 bound ships as a checked boolean."""
    tc = _tok_counts(spark, sf_dir)
    corp = tc.groupBy("tok").agg(F.sum("c").alias("cc"))
    st = tc.groupBy("source").agg(F.sum("c").alias("st"))
    ct = corp.agg(F.sum("cc").alias("ct"))
    terms = (
        corp.crossJoin(F.broadcast(st.crossJoin(ct)))
        .join(tc, ["source", "tok"], "left")
        .select(
            "source",
            (F.col("c") * 1.0 / F.col("st")).alias("p"),
            (F.col("cc") * 1.0 / F.col("ct")).alias("q"),
        )
    )
    m = 0.5 * F.coalesce(F.col("p"), F.lit(0.0)) + 0.5 * F.col("q")
    jsd = F.sum(
        F.when(
            F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)
        ).otherwise(0.0)
    ) + F.sum(0.5 * F.col("q") * F.log(F.col("q") / m))
    return (
        terms.groupBy("source")
        .agg(
            F.round(jsd, 6).alias("jsd"),
            (F.round(jsd, 6) / float(__import__("math").log(2)) <= 1.0001)
            .alias("within_bound"),
        )
        .orderBy("source")
    )


# ===========================================================================
# R538 — Hellinger + total-variation distance, source vs corpus
# ===========================================================================

@register(
    "q_hellinger_tvd",
    f"""
    WITH tc AS ({_SQL_TOK_COUNTS}),
    corp AS (SELECT tok, SUM(c) AS cc FROM tc GROUP BY 1),
    tots AS (
      SELECT s.source, s.st, (SELECT SUM(cc) FROM corp) AS ct
      FROM (SELECT source, SUM(c) AS st FROM tc GROUP BY 1) s
    ),
    terms AS (
      SELECT t.source,
             COALESCE(tc.c, 0) * 1.0 / t.st AS p,
             corp.cc * 1.0 / t.ct AS q
      FROM corp
      CROSS JOIN tots t
      LEFT JOIN tc ON tc.source = t.source AND tc.tok = corp.tok
    )
    SELECT source,
           round(sqrt(GREATEST(1.0 - SUM(sqrt(p * q)), 0.0)), 6)
             AS hellinger,
           round(0.5 * SUM(abs(p - q)), 6) AS tvd,
           sqrt(GREATEST(1.0 - SUM(sqrt(p * q)), 0.0))
             * sqrt(GREATEST(1.0 - SUM(sqrt(p * q)), 0.0))
             <= 0.5 * SUM(abs(p - q)) + 1e-9 AS h2_le_tvd
    FROM terms GROUP BY source ORDER BY source
    """,
)
def q_hellinger_tvd(spark, sf_dir):
    """R538 — Hellinger distance √(1 − Σ√(pq)) and total variation
    ½Σ|p−q| for the same source-vs-corpus token pairs, with the
    H² ≤ TVD inequality shipped as a checked boolean.  Same exact
    BIGINT-ratio discipline as q_js_divergence; sqrt is correctly
    rounded in both engines."""
    tc = _tok_counts(spark, sf_dir)
    corp = tc.groupBy("tok").agg(F.sum("c").alias("cc"))
    st = tc.groupBy("source").agg(F.sum("c").alias("st"))
    ct = corp.agg(F.sum("cc").alias("ct"))
    terms = (
        corp.crossJoin(F.broadcast(st.crossJoin(ct)))
        .join(tc, ["source", "tok"], "left")
        .select(
            "source",
            (F.coalesce(F.col("c"), F.lit(0)) * 1.0 / F.col("st")).alias(
                "p"
            ),
            (F.col("cc") * 1.0 / F.col("ct")).alias("q"),
        )
    )
    bc = F.sum(F.sqrt(F.col("p") * F.col("q")))
    h = F.sqrt(F.greatest(1.0 - bc, F.lit(0.0)))
    tvd = 0.5 * F.sum(F.abs(F.col("p") - F.col("q")))
    return (
        terms.groupBy("source")
        .agg(
            F.round(h, 6).alias("hellinger"),
            F.round(tvd, 6).alias("tvd"),
            (h * h <= tvd + 1e-9).alias("h2_le_tvd"),
        )
        .orderBy("source")
    )


# ===========================================================================
# R539 — frequent itemsets + association rules on event-type baskets
# ===========================================================================

_FI_MIN_SUPPORT = 0.05


@register(
    "q_frequent_itemsets",
    f"""
    WITH basket AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
           FROM basket),
    single AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM basket GROUP BY 1
    ),
    pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM basket a JOIN basket b
        ON b.user_id = a.user_id AND b.event_type <> a.event_type
      GROUP BY 1, 2
    )
    SELECT p.ante, p.cons, p.c AS pair_users,
           round(p.c * 1.0 / nu.n, 6) AS support,
           round(p.c * 1.0 / sa.c, 6) AS confidence,
           round(p.c * 1.0 * nu.n / (sa.c * sc.c), 6) AS lift
    FROM pair p
    JOIN single sa ON sa.event_type = p.ante
    JOIN single sc ON sc.event_type = p.cons
    CROSS JOIN nu
    WHERE p.c * 1.0 / nu.n >= {_FI_MIN_SUPPORT}
    ORDER BY ante, cons
    """,
)
def q_frequent_itemsets(spark, sf_dir):
    """R539 — apriori level 2 over user event-type baskets: every
    A→B rule above 5% support with support/confidence/lift.  The
    distributed work is ONE distinct (user, type) collapse; the pair
    stage is a within-user self-join (≤ C(|types|, 2) rows per user,
    never cross-user), and the rule arithmetic runs on the ≤ T²
    bounded pair frame.  Counts are BIGINT, ratios identical."""
    ev = read_events(spark, sf_dir)
    basket = ev.select("user_id", "event_type").distinct()
    nu = basket.agg(
        F.countDistinct("user_id").alias("n")
    )
    single = basket.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    b = basket.select(
        F.col("user_id").alias("uid"), F.col("event_type").alias("bt")
    )
    pair = (
        basket.join(
            b,
            (F.col("uid") == F.col("user_id"))
            & (F.col("bt") != F.col("event_type")),
        )
        .groupBy(
            F.col("event_type").alias("ante"), F.col("bt").alias("cons")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = single.select(
        F.col("event_type").alias("ante"), F.col("c").alias("ca")
    )
    sc = single.select(
        F.col("event_type").alias("cons"), F.col("c").alias("cc")
    )
    return (
        pair.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .crossJoin(F.broadcast(nu))
        .filter(F.col("c") * 1.0 / F.col("n") >= _FI_MIN_SUPPORT)
        .select(
            "ante", "cons",
            F.col("c").alias("pair_users"),
            F.round(F.col("c") * 1.0 / F.col("n"), 6).alias("support"),
            F.round(F.col("c") * 1.0 / F.col("ca"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("c") * 1.0 * F.col("n")
                / (F.col("ca") * F.col("cc")),
                6,
            ).alias("lift"),
        )
        .orderBy("ante", "cons")
    )
