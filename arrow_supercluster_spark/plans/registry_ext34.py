"""Round-2 registry additions, batch 29 — corpus statistics and
resampling inference:

- q_zipf_fit: Zipf's-law fit of the token rank-frequency curve
  (log-log regression slope/intercept/correlation) — the one-number
  naturalness check for a text corpus;
- q_percent_rank: per-user spend percentile within experiment arm
  (percent_rank / cume_dist window-family coverage);
- q_bootstrap_ci: Bayesian-bootstrap confidence interval for the mean
  event value — deterministic hash-derived weights, fully relational.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import pipeline
from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Zipf fit
# ===========================================================================

_ZIPF_TOP = 100


@register(
    "q_zipf_fit",
    f"""
    WITH counts AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest({SQL_TOKS}) AS tok FROM documents)
      WHERE tok != '' GROUP BY 1
    ),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rk
      FROM counts
    ),
    top AS (
      SELECT ln(CAST(rk AS DOUBLE)) AS lx, ln(CAST(c AS DOUBLE)) AS ly
      FROM ranked WHERE rk <= {_ZIPF_TOP}
    )
    SELECT round(regr_slope(ly, lx), 6) AS slope,
           round(regr_intercept(ly, lx), 6) AS intercept,
           round(corr(ly, lx), 6) AS r,
           COUNT(*) AS n
    FROM top
    """,
)
def q_zipf_fit(spark, sf_dir):
    """Corpus stats — Zipf's-law fit: OLS slope of ln(freq) vs ln(rank)
    over the top-{t} tokens (natural language sits near slope −1 with
    |r| ≈ 1; synthetic/templated text deviates — a one-number corpus
    naturalness check). One token agg (the corpus's only wide pass), a
    rank window on the |vocab|-sized count table, and a 4-value
    regression aggregate on {t} rows. Slope/intercept/corr round to 6
    (engine summation order).""".format(t=_ZIPF_TOP)
    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = counts.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "tok"))
        .alias("rk"),
    ).filter(F.col("rk") <= _ZIPF_TOP)
    top = ranked.select(
        F.log(F.col("rk").cast("double")).alias("lx"),
        F.log(F.col("c").cast("double")).alias("ly"),
    )
    return top.agg(
        F.round(F.expr("regr_slope(ly, lx)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(ly, lx)"), 6).alias("intercept"),
        F.round(F.corr("ly", "lx"), 6).alias("r"),
        F.count(F.lit(1)).alias("n"),
    )


# ===========================================================================
# Percent rank
# ===========================================================================

@register(
    "q_percent_rank",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm, round(SUM(value), 4) AS spend
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    )
    SELECT user_id, arm, spend,
           round(percent_rank() OVER (
             PARTITION BY arm ORDER BY spend, user_id), 6) AS pr,
           round(cume_dist() OVER (
             PARTITION BY arm ORDER BY spend, user_id), 6) AS cd
    FROM per_user
    """,
)
def q_percent_rank(spark, sf_dir):
    """Window family — percent_rank + cume_dist of per-user spend within
    experiment arm: the 'where does this user sit in their cohort'
    readout. The event stream collapses to |users| rows first; the
    windows run arm-partitioned on the user dimension with a
    deterministic (spend, user_id) order — spend pre-rounds so a 1-ulp
    sum difference cannot permute the ranking."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(F.round(F.sum("value"), 4).alias("spend"))
    w = Window.partitionBy("arm").orderBy("spend", "user_id")
    return per_user.select(
        "user_id", "arm", "spend",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# ===========================================================================
# Bayesian bootstrap CI
# ===========================================================================

_BOOT_B = 100


@register(
    "q_bootstrap_ci",
    f"""
    WITH x AS (
      SELECT event_id, value FROM events WHERE value IS NOT NULL
    ),
    rep AS (
      SELECT b.b, x.event_id, x.value,
             -ln((((event_id * {_BOOT_B} + b.b) * {pipeline.HASH_MULT})
                  % {pipeline.HASH_MOD} + 1.0) / ({pipeline.HASH_MOD} + 1.0)) AS w
      FROM x CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
    ),
    means AS (
      SELECT b, round(SUM(w * value) / SUM(w), 6) AS m FROM rep GROUP BY b
    )
    SELECT COUNT(*) AS n_reps,
           round(quantile_cont(m, 0.025), 6) AS lo,
           round(quantile_cont(m, 0.5), 6) AS mid,
           round(quantile_cont(m, 0.975), 6) AS hi
    FROM means
    """,
)
def q_bootstrap_ci(spark, sf_dir):
    """Inference — Bayesian bootstrap (Rubin 1981) 95% CI for the mean
    event value: {b} replicates, each reweighting every row by an
    Exponential(1) draw -ln(u) with u a DETERMINISTIC portable-hash
    uniform keyed by (row, replicate) — reproducible across engines and
    partitionings, where rand()-based resampling is not. Plan: one
    {b}-way generator explode (narrow), one agg keyed by replicate
    (bounded at {b} groups), percentiles over {b} means. Replicate
    means round to 6 (summation order) before the quantiles.""".format(
        b=_BOOT_B
    )
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull()).select(
        "event_id", "value"
    )
    reps = ev.select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (
        ((F.col("event_id") * _BOOT_B + F.col("b")) * F.lit(pipeline.HASH_MULT))
        % F.lit(pipeline.HASH_MOD)
        + 1.0
    ) / F.lit(float(pipeline.HASH_MOD + 1))
    w = -F.log(u)
    means = (
        reps.select("b", "value", w.alias("w"))
        .groupBy("b")
        .agg(
            F.round(F.sum(F.col("w") * F.col("value")) / F.sum("w"), 6).alias("m")
        )
    )
    return means.agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.round(F.expr("percentile(m, 0.025)"), 6).alias("lo"),
        F.round(F.expr("percentile(m, 0.5)"), 6).alias("mid"),
        F.round(F.expr("percentile(m, 0.975)"), 6).alias("hi"),
    )
