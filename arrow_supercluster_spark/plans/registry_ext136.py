"""Round-5 registry additions, batch 131 — unseen-vocabulary
estimation, optimizer-style cardinality estimation, and epidemiology
effect measures:

- q_vocab_richness: corpus diversity profile — observed vocabulary,
  singleton/doubleton counts, the Chao1 richness estimator
  V + F1²/(2F2) (how many word types EXIST including unseen ones —
  capture-recapture's sibling for vocabulary), Simpson concentration
  λ = Σp², and Shannon evenness H/ln V. The how-much-vocabulary-is-
  left question behind corpus-growth decisions (pairs with
  q_heaps_law's growth curve).
- q_join_cardinality_est: the System-R cardinality estimator audited —
  estimate |orders ⋈ lineitem| as |R|·|S|/max(d_R, d_S) (the
  uniformity assumption every cost-based optimizer starts from),
  compare against BOTH the exact output size and the exact
  Σ n_R(k)·n_S(k), and report the q-error. Why optimizers mis-plan
  skewed joins, measured on real keys.
- q_odds_ratio: 2×2 effect measures (exposure = heavy clicker,
  outcome = purchaser): odds ratio and relative risk with 95% CIs on
  the log scale (Woolf/Katz closed forms; z is a literal). The
  epidemiology reading of the contingency table that
  q_chi2_independence only scores for significance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_OR_Z = 1.959964


# ===========================================================================
# R386 — vocabulary richness / diversity profile
# ===========================================================================

@register(
    "q_vocab_richness",
    f"""
    WITH vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest({SQL_TOKS}) AS tok FROM documents)
      WHERE tok != ''
      GROUP BY tok
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(SUM(c) AS BIGINT) AS n,
             SUM(c * c) AS sc2,
             SUM(CAST(round(c * ln(c) * 1e9) AS BIGINT)) AS clnc_s
      FROM vocab
    )
    SELECT v AS vocab_observed, f1 AS singletons, f2 AS doubletons, n,
           round(v + f1 * 1.0 * f1 / (2.0 * (f2 + 1)), 4) AS chao1,
           round(sc2 * 1.0 / (n * 1.0 * n), 6) AS simpson_lambda,
           round((ln(n) - clnc_s * 1.0 / (1e9 * n)) / ln(v), 6)
             AS shannon_evenness
    FROM s
    """,
)
def q_vocab_richness(spark, sf_dir):
    """R386 — corpus diversity profile: observed vocabulary V,
    singletons F1, doubletons F2, the bias-corrected Chao1 estimate
    V + F1²/(2(F2+1)) of the TRUE type count (unseen words included —
    capture-recapture logic on word frequencies), Simpson
    concentration λ = Σc²/N² (exact integer moments), and Shannon
    evenness H/ln V with H = ln N − Σc·ln c/N accumulated from
    integer-scaled c·ln c terms. When Chao1 ≈ V the corpus has
    exhausted its vocabulary; a large gap says more data buys more
    types (the decision q_heaps_law's curve extrapolates). One vocab
    agg + one summary row."""
    from arrow_supercluster_spark.operators.dedup import tokenize

    vocab = (
        _docs(spark, sf_dir)
        .select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = vocab.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
        F.sum(
            F.round(F.col("c") * F.log("c") * 1e9).cast("long")
        ).alias("clnc_s"),
    )
    return s.select(
        F.col("v").cast("long").alias("vocab_observed"),
        F.col("f1").cast("long").alias("singletons"),
        F.col("f2").cast("long").alias("doubletons"),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("v")
            + F.col("f1") * 1.0 * F.col("f1") / (2.0 * (F.col("f2") + 1)),
            4,
        ).alias("chao1"),
        F.round(
            F.col("sc2") * 1.0 / (F.col("n") * 1.0 * F.col("n")), 6
        ).alias("simpson_lambda"),
        F.round(
            (
                F.log(F.col("n"))
                - F.col("clnc_s") * 1.0 / (1e9 * F.col("n"))
            )
            / F.log(F.col("v")),
            6,
        ).alias("shannon_evenness"),
    )


# ===========================================================================
# R387 — join cardinality estimation audit
# ===========================================================================

@register(
    "q_join_cardinality_est",
    """
    WITH r AS (SELECT o_custkey AS k FROM orders),
    sides AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM r) AS n_r,
             (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) FROM r) AS d_r,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_s,
             (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
              FROM customer) AS d_s
    ),
    actual AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_join
      FROM r JOIN customer ON r.k = c_custkey
    )
    SELECT sides.n_r, sides.d_r, sides.n_s, sides.d_s, actual.n_join,
           round(sides.n_r * 1.0 * sides.n_s
                 / greatest(sides.d_r, sides.d_s), 4) AS system_r_estimate,
           round(greatest(
                   (sides.n_r * 1.0 * sides.n_s
                    / greatest(sides.d_r, sides.d_s)) / actual.n_join,
                   actual.n_join
                   / (sides.n_r * 1.0 * sides.n_s
                      / greatest(sides.d_r, sides.d_s))), 4) AS q_error
    FROM sides CROSS JOIN actual
    """,
)
def q_join_cardinality_est(spark, sf_dir):
    """R387 — the System-R join-size estimate audited on real keys:
    est = |R|·|S|/max(d_R, d_S) (containment + uniformity — the
    formula at the heart of every cost-based optimizer, Selinger
    1979), against the exact join size, with the q-error
    max(est/act, act/est) — THE metric of cardinality-estimation
    quality. orders⋈customer is a key/foreign-key join, the case the
    formula is exact for when uniformity holds; skew is what moves
    q_error off 1, and q_error compounding across join trees is why
    optimizers mis-plan (and why AQE re-plans at runtime). Three
    count aggs + one join count."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("k")
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sides = o.agg(
        F.count(F.lit(1)).alias("n_r"),
        F.countDistinct("k").alias("d_r"),
    ).crossJoin(
        F.broadcast(
            c.agg(
                F.count(F.lit(1)).alias("n_s"),
                F.countDistinct("c_custkey").alias("d_s"),
            )
        )
    )
    actual = o.join(c, o["k"] == c["c_custkey"]).agg(
        F.count(F.lit(1)).alias("n_join")
    )
    est = (
        F.col("n_r")
        * 1.0
        * F.col("n_s")
        / F.greatest(F.col("d_r"), F.col("d_s"))
    )
    return sides.crossJoin(F.broadcast(actual)).select(
        "n_r",
        "d_r",
        "n_s",
        "d_s",
        "n_join",
        F.round(est, 4).alias("system_r_estimate"),
        F.round(
            F.greatest(
                est / F.col("n_join"), F.col("n_join") / est
            ),
            4,
        ).alias("q_error"),
    )


# ===========================================================================
# R388 — odds ratio / relative risk with CIs
# ===========================================================================

@register(
    "q_odds_ratio",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clicks,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS spend
      FROM events GROUP BY user_id
    ),
    med AS (
      SELECT CAST(median(clicks) AS DOUBLE) AS mc,
             CAST(median(spend) AS DOUBLE) AS ms
      FROM per_user
    ),
    cells AS (
      SELECT
        CAST(SUM(CASE WHEN clicks > med.mc AND spend > med.ms
                      THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN clicks > med.mc AND spend <= med.ms
                      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        CAST(SUM(CASE WHEN clicks <= med.mc AND spend > med.ms
                      THEN 1 ELSE 0 END) AS BIGINT) AS c,
        CAST(SUM(CASE WHEN clicks <= med.mc AND spend <= med.ms
                      THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM per_user CROSS JOIN med
    )
    SELECT a, b, c, d,
           round(a * 1.0 * d / (b * 1.0 * c), 6) AS odds_ratio,
           round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                     - {_OR_Z} * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS or_ci_low,
           round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                     + {_OR_Z} * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS or_ci_high,
           round((a * 1.0 / (a + b)) / (c * 1.0 / (c + d)), 6)
             AS relative_risk
    FROM cells
    """,
)
def q_odds_ratio(spark, sf_dir):
    """R388 — 2×2 effect measures: exposure = above-median clicker,
    outcome = above-median total spend (median splits keep all four
    cells populated by construction); odds ratio ad/bc with the Woolf
    log-scale 95% CI (z is a literal; √(1/a+1/b+1/c+1/d) on exact
    integer cells) and the relative risk. The direction-and-magnitude
    reading of the contingency table (q_chi2_independence answers
    only 'is there an association'); at 100 TB this is one keyed agg,
    a broadcast median, and a 4-cell rollup. The median split uses
    the engine median of per-user click counts — integers, so both
    engines agree exactly."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("clicks"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("spend"),
    )
    med = per_user.agg(
        F.median("clicks").cast("double").alias("mc"),
        F.median("spend").cast("double").alias("ms"),
    )
    exp_hi = F.col("clicks") > F.col("mc")
    out_hi = F.col("spend") > F.col("ms")
    cells = per_user.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(exp_hi & out_hi, 1).otherwise(0)).alias("a"),
        F.sum(F.when(exp_hi & ~out_hi, 1).otherwise(0)).alias("b"),
        F.sum(F.when(~exp_hi & out_hi, 1).otherwise(0)).alias("c"),
        F.sum(F.when(~exp_hi & ~out_hi, 1).otherwise(0)).alias("d"),
    )
    orx = F.col("a") * 1.0 * F.col("d") / (F.col("b") * 1.0 * F.col("c"))
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c")
        + 1.0 / F.col("d")
    )
    return cells.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.col("d").cast("long").alias("d"),
        F.round(orx, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(orx) - _OR_Z * se), 6).alias("or_ci_low"),
        F.round(F.exp(F.log(orx) + _OR_Z * se), 6).alias("or_ci_high"),
        F.round(
            (F.col("a") * 1.0 / (F.col("a") + F.col("b")))
            / (F.col("c") * 1.0 / (F.col("c") + F.col("d"))),
            6,
        ).alias("relative_risk"),
    )
