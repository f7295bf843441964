"""Round-5 registry additions, batch 117 — bandit allocation,
empirical-Bayes shrinkage, and loop-free jackknife:

- q_ucb_allocation: UCB1 bandit report per event variant — mean reward
  (integer cents) + sqrt(2 ln N / n) exploration bonus, the allocation
  a batch-updated bandit would play next. The online-learning
  companion to the fixed-horizon (q_ab_test) and sequential
  (q_sprt_sequential) tests.
- q_eb_shrinkage: empirical-Bayes beta-binomial shrinkage of per-user
  CTRs — method-of-moments (α, β) from the corpus, then every user's
  rate shrinks toward the prior mean by their own sample size:
  (s + α)/(n + α + β). Rate moments accumulate as INTEGER-scaled
  values so the fitted prior is bit-stable. The fix for q_wilson's
  cousin problem: ranking many small-sample units.
- q_jackknife_ratio: jackknife standard error of a ratio estimator
  WITHOUT resampling loops — for r = ΣY/ΣX, each leave-one-out
  replicate r_i = (ΣY−y_i)/(ΣX−x_i) is a per-row closed form given
  the broadcast totals; the SE aggregates integer-scaled replicates.
  The distributed-uncertainty trick: n replicates in ONE pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_EB_SCALE = 1_000_000_000  # integer scale for rate moments


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ===========================================================================
# R345 — UCB1 bandit allocation report
# ===========================================================================

@register(
    "q_ucb_allocation",
    """
    WITH arms AS (
      SELECT event_type AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_pulls,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY event_type
    ),
    tot AS (SELECT SUM(n_pulls) AS big_n FROM arms)
    SELECT arm, n_pulls,
           round(cents / (100.0 * n_pulls), 4) AS mean_reward,
           round(sqrt(2.0 * ln(tot.big_n) / n_pulls) * 100.0, 4) AS bonus,
           round(cents / (100.0 * n_pulls)
                 + sqrt(2.0 * ln(tot.big_n) / n_pulls) * 100.0, 4)
             AS ucb_score,
           (cents / (100.0 * n_pulls)
            + sqrt(2.0 * ln(tot.big_n) / n_pulls) * 100.0) = (
             SELECT MAX(a2.cents / (100.0 * a2.n_pulls)
                        + sqrt(2.0 * ln(t2.big_n) / a2.n_pulls) * 100.0)
             FROM arms a2 CROSS JOIN tot t2
           ) AS play_next
    FROM arms CROSS JOIN tot
    ORDER BY arm
    """,
)
def q_ucb_allocation(spark, sf_dir):
    """R345 — UCB1 report over the event-type arms: mean reward from
    exact integer cents, exploration bonus √(2 ln N / n) (scaled to the
    reward's units), and the play_next flag on the argmax — what a
    batch-updated bandit plays in the next round. ln/sqrt run on
    integer-derived values, so the scores are deterministic doubles and
    the argmax is engine-stable. One keyed agg + a broadcast total —
    the canonical explore/exploit readout."""
    arms = _events(spark, sf_dir).groupBy(
        F.col("event_type").alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("n_pulls"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    tot = arms.agg(F.sum("n_pulls").alias("big_n"))
    score = (
        F.col("cents") / (100.0 * F.col("n_pulls"))
        + F.sqrt(2.0 * F.log("big_n") / F.col("n_pulls")) * 100.0
    )
    scored = arms.crossJoin(F.broadcast(tot)).select(
        "arm",
        "n_pulls",
        F.round(F.col("cents") / (100.0 * F.col("n_pulls")), 4).alias(
            "mean_reward"
        ),
        F.round(
            F.sqrt(2.0 * F.log("big_n") / F.col("n_pulls")) * 100.0, 4
        ).alias("bonus"),
        F.round(score, 4).alias("ucb_score"),
        score.alias("_raw"),
    )
    best = scored.agg(F.max("_raw").alias("_best"))
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "arm",
            "n_pulls",
            "mean_reward",
            "bonus",
            "ucb_score",
            (F.col("_raw") == F.col("_best")).alias("play_next"),
        )
        .orderBy("arm")
    )


# ===========================================================================
# R346 — empirical-Bayes beta-binomial shrinkage
# ===========================================================================

@register(
    "q_eb_shrinkage",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS s,
             CAST(SUM(CASE WHEN event_type IN ('click', 'view')
                           THEN 1 ELSE 0 END) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ),
    eligible AS (SELECT * FROM per_user WHERE n > 0),
    moments AS (
      SELECT COUNT(*) AS k,
             SUM(CAST(round(s * 1.0 * {_EB_SCALE} / n) AS BIGINT)) AS m1s,
             SUM(CAST(round((s * 1.0 / n) * (s * 1.0 / n) * {_EB_SCALE})
                      AS BIGINT)) AS m2s
      FROM eligible
    ),
    prior AS (
      SELECT m1s * 1.0 / (k * {_EB_SCALE}) AS mu,
             m2s * 1.0 / (k * {_EB_SCALE})
               - (m1s * 1.0 / (k * {_EB_SCALE}))
                 * (m1s * 1.0 / (k * {_EB_SCALE})) AS var
      FROM moments
    ),
    ab AS (
      SELECT mu, var,
             mu * (mu * (1 - mu) / var - 1) AS alpha,
             (1 - mu) * (mu * (1 - mu) / var - 1) AS beta
      FROM prior
    )
    SELECT e.user_id, e.s, e.n,
           round(e.s * 1.0 / e.n, 6) AS raw_rate,
           round((e.s + ab.alpha) / (e.n + ab.alpha + ab.beta), 6)
             AS shrunk_rate,
           round(ab.alpha, 6) AS alpha,
           round(ab.beta, 6) AS beta
    FROM eligible e CROSS JOIN ab
    ORDER BY e.user_id
    """,
)
def q_eb_shrinkage(spark, sf_dir):
    """R346 — empirical-Bayes beta-binomial shrinkage of per-user CTR:
    method-of-moments prior (μ, σ² of the raw rates, accumulated as
    INTEGER-scaled values so the fit is order-independent), α =
    μ(μ(1−μ)/σ² − 1), β = (1−μ)(…), posterior mean (s+α)/(n+α+β).
    Small-n users shrink hard toward the prior; large-n users keep
    their data — the partial-pooling answer to q_wilson_ranking's
    pessimistic bound. One keyed agg → 1-row prior broadcast → per-row
    closed form."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("s"),
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        ).alias("n"),
    ).filter(F.col("n") > 0)
    rate = F.col("s") * 1.0 / F.col("n")
    moments = per_user.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round(rate * _EB_SCALE).cast("long")).alias("m1s"),
        F.sum(F.round(rate * rate * _EB_SCALE).cast("long")).alias("m2s"),
    )
    mu = F.col("m1s") * 1.0 / (F.col("k") * _EB_SCALE)
    var = F.col("m2s") * 1.0 / (F.col("k") * _EB_SCALE) - mu * mu
    ab = moments.select(
        (mu * (mu * (1 - mu) / var - 1)).alias("alpha"),
        ((1 - mu) * (mu * (1 - mu) / var - 1)).alias("beta"),
    )
    return (
        per_user.crossJoin(F.broadcast(ab))
        .select(
            "user_id",
            "s",
            "n",
            F.round(rate, 6).alias("raw_rate"),
            F.round(
                (F.col("s") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                6,
            ).alias("shrunk_rate"),
            F.round("alpha", 6).alias("alpha"),
            F.round("beta", 6).alias("beta"),
        )
        .orderBy("user_id")
    )


# ===========================================================================
# R347 — jackknife SE of a ratio estimator, loop-free
# ===========================================================================

@register(
    "q_jackknife_ratio",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(y) AS sy, SUM(x) AS sx
      FROM per_user
    ),
    reps AS (
      SELECT (t.sy - p.y) * 1.0 / (100.0 * (t.sx - p.x)) AS ri
      FROM per_user p CROSS JOIN tot t
    ),
    rbar AS (
      SELECT COUNT(*) AS k,
             SUM(CAST(round(ri * 1e6) AS BIGINT)) / (1e6 * COUNT(*)) AS m
      FROM reps
    ),
    devs AS (
      SELECT CAST(round((reps.ri - rbar.m) * 1e6) AS BIGINT) AS di
      FROM reps CROSS JOIN rbar
    ),
    agg AS (SELECT SUM(di * di) AS sdd FROM devs)
    SELECT CAST(rbar.k AS BIGINT) AS n_units,
           round(tot.sy * 1.0 / (100.0 * tot.sx), 6) AS ratio,
           round(sqrt((rbar.k - 1.0) / rbar.k * (agg.sdd / 1e12)), 6)
             AS jackknife_se
    FROM rbar CROSS JOIN agg CROSS JOIN tot
    """,
)
def q_jackknife_ratio(spark, sf_dir):
    """R347 — jackknife SE of the ratio estimator r = Σcents(purchase)
    / Σviews over users, WITHOUT resampling loops: each leave-one-out
    replicate rᵢ = (ΣY−yᵢ)/(ΣX−xᵢ) is a per-row closed form against
    the broadcast totals, so all n replicates materialize in ONE pass;
    SE² = (k−1)/k · Σ(rᵢ−r̄)². The replicate mean uses integer-scaled
    replicates and the SE uses integer-scaled DEVIATIONS (µ-grid: ppm
    precision, and di² stays far inside int64 even for heavy units),
    making the SE bit-stable at any partitioning. The uncertainty quantification every ratio
    metric (revenue per view, tokens per doc) should ship with —
    at 100 TB a bootstrap is 1000 passes, the jackknife is one."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("y"),
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("x"),
    )
    tot = per_user.agg(
        F.sum("y").alias("sy"),
        F.sum("x").alias("sx"),
    )
    reps = per_user.crossJoin(F.broadcast(tot)).select(
        (
            (F.col("sy") - F.col("y"))
            * 1.0
            / (100.0 * (F.col("sx") - F.col("x")))
        ).alias("ri")
    )
    # pass 1: replicate mean from integer-scaled replicates (exact sum);
    # pass 2: integer-scaled DEVIATIONS — these shrink as 1/k, so the
    # squared sum stays far inside int64 at any unit count
    rbar = reps.agg(
        F.count(F.lit(1)).alias("k"),
        (
            F.sum(F.round(F.col("ri") * 1e6).cast("long"))
            / (1e6 * F.count(F.lit(1)))
        ).alias("m"),
    )
    devs = reps.crossJoin(F.broadcast(rbar)).select(
        F.round((F.col("ri") - F.col("m")) * 1e6).cast("long").alias("di"),
        "k",
    )
    agg = devs.groupBy("k").agg(
        F.sum(F.col("di") * F.col("di")).alias("sdd")
    )
    se = F.sqrt(
        (F.col("k") - 1.0) / F.col("k") * (F.col("sdd") / 1e12)
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("k").cast("long").alias("n_units"),
        F.round(F.col("sy") * 1.0 / (100.0 * F.col("sx")), 6).alias("ratio"),
        F.round(se, 6).alias("jackknife_se"),
    )
