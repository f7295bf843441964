"""Round-5 registry additions, batch 137 — evidence pooling, exact
small-d PCA, and equivalence testing:

- q_meta_analysis: fixed-effect inverse-variance meta-analysis of the
  weekly click-vs-purchase mean differences — pooled effect, its SE,
  Cochran's Q heterogeneity statistic, and I² = (Q − df)/Q. Treats
  each week as an independent 'study': the evidence-pooling pattern
  (and the heterogeneity readout that says whether pooling is even
  legitimate). All per-week moments exact integer cents.
- q_pca_2d: EXACT principal components of the (clicks, spend) user
  cloud — the 2×2 covariance eigenproblem in closed form (λ =
  (tr ± √(tr² − 4det))/2, axis angle from atan2), explained-variance
  ratio, correlation. PCA without any iterative solver: for d = 2 the
  algebra is exact, and the covariance entries are exact integer
  moments — the dimensionality-reduction primitive at the grain
  dashboards actually use.
- q_tost_equivalence: two one-sided tests (TOST) for EQUIVALENCE of
  click vs view mean values within ±5% of the pooled mean — the test
  that can conclude 'these are the same' (a non-significant t-test
  never licenses that). Closed-form Welch t's against both margins;
  z-critical literal; verdict = both one-sided tests reject.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_MA_SCALE = 1_000_000_000
_TOST_Z = 1.644854  # z_{0.95}: one-sided 5%
_TOST_MARGIN = 0.05


# ===========================================================================
# R404 — fixed-effect meta-analysis
# ===========================================================================

@register(
    "q_meta_analysis",
    f"""
    WITH obs AS (
      SELECT (CAST(strftime(ts, '%d') AS INTEGER) - 1) // 7 AS w,
             event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    cells AS (
      SELECT w, event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cents) AS s, SUM(cents * cents) AS ssq
      FROM obs GROUP BY w, event_type
    ),
    studies AS (
      SELECT a.w,
             a.s / (100.0 * a.n) - b.s / (100.0 * b.n) AS effect,
             ((a.ssq - a.s * 1.0 * a.s / a.n) / (10000.0 * (a.n - 1))) / a.n
             + ((b.ssq - b.s * 1.0 * b.s / b.n) / (10000.0 * (b.n - 1)))
               / b.n AS var_e
      FROM cells a JOIN cells b
        ON a.w = b.w AND a.event_type = 'click'
       AND b.event_type = 'purchase'
    ),
    terms AS (
      SELECT w, effect, var_e,
             CAST(round(1.0 / var_e * {_MA_SCALE}) AS BIGINT) AS w_s,
             CAST(round(effect / var_e * {_MA_SCALE}) AS BIGINT) AS we_s,
             CAST(round(effect * effect / var_e * {_MA_SCALE}) AS BIGINT)
               AS we2_s
      FROM studies
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(w_s) AS sw, SUM(we_s) AS swe, SUM(we2_s) AS swe2
      FROM terms
    )
    SELECT k AS n_studies,
           round(swe * 1.0 / sw, 4) AS pooled_effect,
           round(sqrt({_MA_SCALE} * 1.0 / sw), 4) AS pooled_se,
           round((swe2 - swe * 1.0 * swe / sw) / ({_MA_SCALE} * 1.0), 4)
             AS cochran_q,
           round(greatest((swe2 - swe * 1.0 * swe / sw)
                          / ({_MA_SCALE} * 1.0) - (k - 1), 0.0)
                 / nullif((swe2 - swe * 1.0 * swe / sw)
                          / ({_MA_SCALE} * 1.0), 0.0), 4) AS i_squared
    FROM pooled
    """,
)
def q_meta_analysis(spark, sf_dir):
    """R404 — fixed-effect meta-analysis over the weekly 'studies':
    per week, effect = mean(click) − mean(purchase) with Welch
    variance (exact integer-cent moments); pooled effect = Σwᵢθᵢ/Σwᵢ
    with wᵢ = 1/varᵢ; heterogeneity by Cochran's Q = Σwᵢ(θᵢ − θ̂)² and
    I² = max(Q − df, 0)/Q. Weights and weighted effects integer-scale
    before pooling (order-free sums). High I² says the weeks disagree
    — pool with random effects or not at all; the
    evidence-aggregation discipline dashboards skip when they average
    averages."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("click", "purchase")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    cells = ev.groupBy(
        ((F.dayofmonth("ts") - 1) / 7).cast("long").alias("w"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents * cents).alias("ssq"),
    )
    a = cells.filter(F.col("event_type") == "click").select(
        "w",
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("ssq").alias("qa"),
    )
    b = cells.filter(F.col("event_type") == "purchase").select(
        "w",
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("ssq").alias("qb"),
    )
    var_a = (F.col("qa") - F.col("sa") * 1.0 * F.col("sa") / F.col("na")) / (
        10000.0 * (F.col("na") - 1)
    )
    var_b = (F.col("qb") - F.col("sb") * 1.0 * F.col("sb") / F.col("nb")) / (
        10000.0 * (F.col("nb") - 1)
    )
    studies = a.join(b, "w").select(
        "w",
        (
            F.col("sa") / (100.0 * F.col("na"))
            - F.col("sb") / (100.0 * F.col("nb"))
        ).alias("effect"),
        (var_a / F.col("na") + var_b / F.col("nb")).alias("var_e"),
    )
    terms = studies.select(
        F.round(1.0 / F.col("var_e") * _MA_SCALE).cast("long").alias("w_s"),
        F.round(F.col("effect") / F.col("var_e") * _MA_SCALE)
        .cast("long")
        .alias("we_s"),
        F.round(
            F.col("effect") * F.col("effect") / F.col("var_e") * _MA_SCALE
        )
        .cast("long")
        .alias("we2_s"),
    )
    pooled = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("w_s").alias("sw"),
        F.sum("we_s").alias("swe"),
        F.sum("we2_s").alias("swe2"),
    )
    q = (
        F.col("swe2") - F.col("swe") * 1.0 * F.col("swe") / F.col("sw")
    ) / (_MA_SCALE * 1.0)
    return pooled.select(
        F.col("k").cast("long").alias("n_studies"),
        F.round(F.col("swe") * 1.0 / F.col("sw"), 4).alias("pooled_effect"),
        F.round(F.sqrt(_MA_SCALE * 1.0 / F.col("sw")), 4).alias("pooled_se"),
        F.round(q, 4).alias("cochran_q"),
        F.round(
            F.greatest(q - (F.col("k") - 1), F.lit(0.0))
            / F.nullif(q, F.lit(0.0)),
            4,
        ).alias("i_squared"),
    )


# ===========================================================================
# R405 — exact 2-D PCA
# ===========================================================================

@register(
    "q_pca_2d",
    """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM per_user
    ),
    cov AS (
      SELECT n,
             (sxx - sx * 1.0 * sx / n) / (n - 1) AS cxx,
             (syy - sy * 1.0 * sy / n) / (n - 1) AS cyy,
             (sxy - sx * 1.0 * sy / n) / (n - 1) AS cxy
      FROM m
    ),
    eig AS (
      SELECT n, cxx, cyy, cxy,
             (cxx + cyy) / 2.0
               + sqrt((cxx - cyy) * (cxx - cyy) / 4.0 + cxy * cxy) AS l1,
             (cxx + cyy) / 2.0
               - sqrt((cxx - cyy) * (cxx - cyy) / 4.0 + cxy * cxy) AS l2
      FROM cov
    )
    SELECT n AS n_users,
           round(l1, 4) AS lambda1, round(l2, 4) AS lambda2,
           round(l1 / (l1 + l2), 6) AS explained_ratio,
           round(degrees(atan2(l1 - cxx, cxy)), 4) AS pc1_angle_deg,
           round(cxy / sqrt(cxx * cyy), 6) AS correlation
    FROM eig
    """,
)
def q_pca_2d(spark, sf_dir):
    """R405 — exact PCA of the (clicks, spend-cents) user cloud: the
    2×2 covariance eigenproblem in CLOSED FORM — λ₁,₂ = (c_xx+c_yy)/2
    ± √((c_xx−c_yy)²/4 + c_xy²), PC1 direction from atan2(λ₁ − c_xx,
    c_xy), explained-variance ratio λ₁/(λ₁+λ₂). Covariance entries
    assemble from exact integer Σx, Σy, Σxy, Σx², Σy² — no solver, no
    iteration, no convergence question (contrast the rank-1 LSA power
    iteration R290, which this certifies in miniature). The 2-feature
    case IS most dashboard PCA; everything here is one agg + one row
    of algebra."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("y"),
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    cxx = (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / n) / (n - 1)
    cyy = (F.col("syy") - F.col("sy") * 1.0 * F.col("sy") / n) / (n - 1)
    cxy = (F.col("sxy") - F.col("sx") * 1.0 * F.col("sy") / n) / (n - 1)
    disc = F.sqrt((cxx - cyy) * (cxx - cyy) / 4.0 + cxy * cxy)
    l1 = (cxx + cyy) / 2.0 + disc
    l2 = (cxx + cyy) / 2.0 - disc
    return m.select(
        n.cast("long").alias("n_users"),
        F.round(l1, 4).alias("lambda1"),
        F.round(l2, 4).alias("lambda2"),
        F.round(l1 / (l1 + l2), 6).alias("explained_ratio"),
        F.round(F.degrees(F.atan2(l1 - cxx, cxy)), 4).alias("pc1_angle_deg"),
        F.round(cxy / F.sqrt(cxx * cyy), 6).alias("correlation"),
    )


# ===========================================================================
# R406 — TOST equivalence testing
# ===========================================================================

@register(
    "q_tost_equivalence",
    f"""
    WITH cells AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(round(value * 100) AS BIGINT)) AS s,
             SUM(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS ssq
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY event_type
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN event_type = 'click' THEN n END) AS na,
        MAX(CASE WHEN event_type = 'click' THEN s END) AS sa,
        MAX(CASE WHEN event_type = 'click' THEN ssq END) AS qa,
        MAX(CASE WHEN event_type = 'view' THEN n END) AS nb,
        MAX(CASE WHEN event_type = 'view' THEN s END) AS sb,
        MAX(CASE WHEN event_type = 'view' THEN ssq END) AS qb
      FROM cells
    ),
    stats AS (
      SELECT na, nb,
             sa / (100.0 * na) - sb / (100.0 * nb) AS diff,
             (sa + sb) / (100.0 * (na + nb)) AS pooled_mean,
             sqrt(((qa - sa * 1.0 * sa / na) / (10000.0 * (na - 1))) / na
                  + ((qb - sb * 1.0 * sb / nb) / (10000.0 * (nb - 1))) / nb)
               AS se
      FROM wide
    )
    SELECT round(diff, 4) AS diff,
           round({_TOST_MARGIN} * pooled_mean, 4) AS margin,
           round(se, 4) AS se,
           round((diff + {_TOST_MARGIN} * pooled_mean) / se, 4) AS t_lower,
           round((diff - {_TOST_MARGIN} * pooled_mean) / se, 4) AS t_upper,
           ((diff + {_TOST_MARGIN} * pooled_mean) / se > {_TOST_Z}
            AND (diff - {_TOST_MARGIN} * pooled_mean) / se < -{_TOST_Z})
             AS equivalent
    FROM stats
    """,
)
def q_tost_equivalence(spark, sf_dir):
    """R406 — TOST equivalence test of click vs view mean values with
    a ±{m:.0%}-of-pooled-mean margin: reject 'diff ≤ −δ' AND reject
    'diff ≥ +δ' (both one-sided z's beyond ±{z}), and only then
    conclude equivalence — the inference a non-significant q_ab_test
    CANNOT license ('absence of evidence…'). All moments exact integer
    cents; the margin derives from the data but through deterministic
    closed forms. Completes the testing family: superiority
    (q_ab_test), sequential (q_sprt_sequential), sizing (q_ab_power),
    equivalence (here).""".format(m=_TOST_MARGIN, z=_TOST_Z)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("click", "view")
    )
    cents = F.round(F.col("value") * 100).cast("long")
    cells = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents * cents).alias("ssq"),
    )
    wide = cells.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("na"),
        F.max(F.when(F.col("event_type") == "click", F.col("s"))).alias("sa"),
        F.max(F.when(F.col("event_type") == "click", F.col("ssq"))).alias(
            "qa"
        ),
        F.max(F.when(F.col("event_type") == "view", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("event_type") == "view", F.col("s"))).alias("sb"),
        F.max(F.when(F.col("event_type") == "view", F.col("ssq"))).alias(
            "qb"
        ),
    )
    diff = F.col("sa") / (100.0 * F.col("na")) - F.col("sb") / (
        100.0 * F.col("nb")
    )
    pooled = (F.col("sa") + F.col("sb")) / (
        100.0 * (F.col("na") + F.col("nb"))
    )
    se = F.sqrt(
        (
            (F.col("qa") - F.col("sa") * 1.0 * F.col("sa") / F.col("na"))
            / (10000.0 * (F.col("na") - 1))
        )
        / F.col("na")
        + (
            (F.col("qb") - F.col("sb") * 1.0 * F.col("sb") / F.col("nb"))
            / (10000.0 * (F.col("nb") - 1))
        )
        / F.col("nb")
    )
    margin = _TOST_MARGIN * pooled
    t_lo = (diff + margin) / se
    t_hi = (diff - margin) / se
    return wide.select(
        F.round(diff, 4).alias("diff"),
        F.round(margin, 4).alias("margin"),
        F.round(se, 4).alias("se"),
        F.round(t_lo, 4).alias("t_lower"),
        F.round(t_hi, 4).alias("t_upper"),
        ((t_lo > _TOST_Z) & (t_hi < -_TOST_Z)).alias("equivalent"),
    )
