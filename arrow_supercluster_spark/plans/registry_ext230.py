"""Round-9 registry additions, batch 230 — causal-inference and
empirical-Bayes completions (the experimentation family beside
q_ab_test/q_cuped/q_srm_check), all SQL-backed and all closed-form:

- q_did_estimator: 2×2 difference-in-differences over a deterministic
  user split × pre/post window, integer-cents outcomes.
- q_iv_wald: instrumental-variable Wald ratio — early first-touch as
  the instrument for high engagement, purchase value as the outcome;
  reduced form / first stage emitted alongside the LATE.
- q_propensity_strata: stratified ATE — activity-band strata as the
  propensity proxy, within-stratum treated−control differences
  weighted by stratum mass (only both-arm strata count, stated).
- q_james_stein: James-Stein shrinkage of per-nation account-balance
  means toward the grand mean (the (k−3)σ̂²/S positive-part factor).
- q_beta_binomial_eb: empirical-Bayes beta-binomial shrinkage of
  per-user purchase rates (method-of-moments α, β; posterior
  (k+α)/(n+α+β)).
- q_win_ratio: hierarchical win ratio between the two arms — churn
  status first, purchase cents second, ties reported; pairs over the
  user dimension (the q_cindex bound class).

At 100 TB: every estimator is a handful of keyed aggs over per-user
rollups; the only pairwise stage (win ratio) pairs the user DIMENSION
under the deterministic portable-hash sample cap (registry_ext228
spark_hash_cap — implemented on BOTH engine sides, no broadcast hint,
AQE decides); outcomes use exact integer cents everywhere so the
cross-engine comparisons never sit on a float boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext228 import (
    _sql_hash_cap,
    spark_hash_cap,
)
from arrow_supercluster_spark.sources.tables import read_events, read_table

_SPLIT_TS = "2024-01-16"  # pre/post boundary: the window's midpoint
_EARLY_TS = "2024-01-01 12:00:00"  # IV instrument: first touch before noon of day 1
_IV_D_MIN = 67            # treatment: ≥ median-ish lifetime events (per-user counts span ~50-88 at every SF)

# per-user rollup shared by the estimators: arm (user_id parity),
# pre/post purchase cents, lifetime event count, first/last touch
_SQL_USERS = f"""
    users AS MATERIALIZED (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                             AND ts < TIMESTAMP '{_SPLIT_TS} 00:00:00'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre_cents,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                             AND ts >= TIMESTAMP '{_SPLIT_TS} 00:00:00'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post_cents,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purch
      FROM events GROUP BY user_id
    )"""


def _spark_users(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    is_p = F.col("event_type") == "purchase"
    pre = F.col("ts") < F.lit(_SPLIT_TS).cast("timestamp")
    return ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.when(is_p & pre, cents).otherwise(F.lit(0).cast("long")))
        .alias("pre_cents"),
        F.sum(F.when(is_p & ~pre, cents).otherwise(F.lit(0).cast("long")))
        .alias("post_cents"),
        F.sum(F.when(is_p, cents).otherwise(F.lit(0).cast("long")))
        .alias("cents"),
        F.sum(F.when(is_p, 1).otherwise(0)).cast("long").alias("n_purch"),
    )


# ===========================================================================
# R669 — difference-in-differences
# ===========================================================================


@register(
    "q_did_estimator",
    f"""
    WITH {_SQL_USERS},
    cells AS (
      -- exact integer SUM, ONE division: AVG(x/100.0) would float-fold
      -- per row in engine-specific order (caught at sf0.001)
      SELECT arm,
             SUM(pre_cents) * 1.0 / COUNT(*) / 100.0 AS pre_mean,
             SUM(post_cents) * 1.0 / COUNT(*) / 100.0 AS post_mean,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM users GROUP BY arm
    )
    SELECT t.n AS n_treated, c.n AS n_control,
           round(t.pre_mean, 4) AS treated_pre,
           round(t.post_mean, 4) AS treated_post,
           round(c.pre_mean, 4) AS control_pre,
           round(c.post_mean, 4) AS control_post,
           round((t.post_mean - t.pre_mean)
                 - (c.post_mean - c.pre_mean), 4) AS did,
           round(t.post_mean - c.post_mean, 4) AS naive_post_diff
    FROM (SELECT * FROM cells WHERE arm = 1) t,
         (SELECT * FROM cells WHERE arm = 0) c
    """,
)
def q_did_estimator(spark, sf_dir):
    """R669 — difference-in-differences on the 2×2 (arm × pre/post)
    design: DiD = (T̄post−T̄pre) − (C̄post−C̄pre) over per-user purchase
    value in exact integer cents (zero for purchase-less users — the
    per-user rollup is the universe, so attrition can't bias the cell
    means).  The naive post-only difference is emitted beside it — the
    gap between the two is exactly the pre-period imbalance DiD
    removes.  Two keyed aggs; nothing corpus-sized past the rollup."""
    u = _spark_users(spark, sf_dir)
    cells = u.groupBy("arm").agg(
        # exact integer SUM, one division — see the SQL twin's note
        (F.sum("pre_cents") * 1.0 / F.count(F.lit(1)) / 100.0).alias(
            "pre_mean"
        ),
        (F.sum("post_cents") * 1.0 / F.count(F.lit(1)) / 100.0).alias(
            "post_mean"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    t = cells.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_treated"),
        F.col("pre_mean").alias("tpre"),
        F.col("post_mean").alias("tpost"),
    )
    c = cells.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_control"),
        F.col("pre_mean").alias("cpre"),
        F.col("post_mean").alias("cpost"),
    )
    return t.crossJoin(c).select(
        "n_treated",
        "n_control",
        F.round("tpre", 4).alias("treated_pre"),
        F.round("tpost", 4).alias("treated_post"),
        F.round("cpre", 4).alias("control_pre"),
        F.round("cpost", 4).alias("control_post"),
        F.round(
            (F.col("tpost") - F.col("tpre")) - (F.col("cpost") - F.col("cpre")),
            4,
        ).alias("did"),
        F.round(F.col("tpost") - F.col("cpost"), 4).alias("naive_post_diff"),
    )


# ===========================================================================
# R670 — instrumental-variable Wald estimator
# ===========================================================================


@register(
    "q_iv_wald",
    f"""
    WITH {_SQL_USERS},
    iv AS (
      SELECT CASE WHEN first_ts < TIMESTAMP '{_EARLY_TS}'
                  THEN 1 ELSE 0 END AS z,
             CASE WHEN n_events >= {_IV_D_MIN} THEN 1.0 ELSE 0.0 END AS d,
             cents / 100.0 AS y
      FROM users
    ),
    g AS (
      SELECT z, AVG(y) AS my, AVG(d) AS md, CAST(COUNT(*) AS BIGINT) AS n
      FROM iv GROUP BY z
    )
    SELECT z1.n AS n_encouraged, z0.n AS n_rest,
           round(z1.my - z0.my, 6) AS reduced_form,
           round(z1.md - z0.md, 6) AS first_stage,
           round((z1.my - z0.my) / (z1.md - z0.md), 4) AS wald_late
    FROM (SELECT * FROM g WHERE z = 1) z1,
         (SELECT * FROM g WHERE z = 0) z0
    """,
)
def q_iv_wald(spark, sf_dir):
    """R670 — Wald IV estimator: instrument Z = first touch before noon of day 1
    (the fixture's users all arrive within ~2 days, so the noon-of-day-1 cut is the split with variance at every SF; earlier exposure mechanically encourages higher lifetime activity
    — a RELEVANT instrument on this data, first_stage emitted so the
    reader can check), treatment D = ≥{d} lifetime events (the per-user count median — counts span ~50-88 at every SF, so both D arms are populated), outcome Y =
    purchase value.  LATE = reduced form / first stage.  Two 1-row
    aggs over the user rollup; the estimator is two means and a
    division.""".format(d=_IV_D_MIN)
    u = _spark_users(spark, sf_dir)
    iv = u.select(
        F.when(
            F.col("first_ts") < F.lit(_EARLY_TS).cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("z"),
        F.when(F.col("n_events") >= _IV_D_MIN, 1.0).otherwise(0.0).alias("d"),
        (F.col("cents") / 100.0).alias("y"),
    )
    g = iv.groupBy("z").agg(
        F.avg("y").alias("my"),
        F.avg("d").alias("md"),
        F.count(F.lit(1)).alias("n"),
    )
    z1 = g.filter(F.col("z") == 1).select(
        F.col("n").alias("n_encouraged"),
        F.col("my").alias("my1"),
        F.col("md").alias("md1"),
    )
    z0 = g.filter(F.col("z") == 0).select(
        F.col("n").alias("n_rest"),
        F.col("my").alias("my0"),
        F.col("md").alias("md0"),
    )
    return z1.crossJoin(z0).select(
        "n_encouraged",
        "n_rest",
        F.round(F.col("my1") - F.col("my0"), 6).alias("reduced_form"),
        F.round(F.col("md1") - F.col("md0"), 6).alias("first_stage"),
        F.round(
            (F.col("my1") - F.col("my0")) / (F.col("md1") - F.col("md0")), 4
        ).alias("wald_late"),
    )


# ===========================================================================
# R671 — propensity-stratified ATE
# ===========================================================================

_PS_BANDS = (30, 40, 50, 60)  # n_events stratum edges


def _sql_band() -> str:
    e = _PS_BANDS
    return (
        f"CASE WHEN n_events < {e[0]} THEN 0 "
        f"WHEN n_events < {e[1]} THEN 1 "
        f"WHEN n_events < {e[2]} THEN 2 "
        f"WHEN n_events < {e[3]} THEN 3 ELSE 4 END"
    )


@register(
    "q_propensity_strata",
    f"""
    WITH {_SQL_USERS},
    strata AS (
      SELECT {_sql_band()} AS stratum, arm,
             AVG(cents / 100.0) AS my, CAST(COUNT(*) AS BIGINT) AS n
      FROM users GROUP BY 1, 2
    ),
    paired AS (
      SELECT t.stratum, t.my - c.my AS diff, t.n + c.n AS n
      FROM (SELECT * FROM strata WHERE arm = 1) t
      JOIN (SELECT * FROM strata WHERE arm = 0) c USING (stratum)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata_used,
           CAST(SUM(n) AS BIGINT) AS n_users_covered,
           round(SUM(diff * n) / SUM(n), 4) AS ate_stratified
    FROM paired
    """,
)
def q_propensity_strata(spark, sf_dir):
    """R671 — stratified ATE with activity bands as the propensity
    proxy (edges {e}): within each stratum the arms are compared
    apples-to-apples, and the stratum differences average with
    stratum-mass weights.  Strata missing either arm drop out —
    n_strata_used says how many counted (the overlap/positivity
    diagnostic).  Bounded strata (≤5), exact-cents outcomes.""".format(
        e=_PS_BANDS
    )
    u = _spark_users(spark, sf_dir)
    e = _PS_BANDS
    band = (
        F.when(F.col("n_events") < e[0], 0)
        .when(F.col("n_events") < e[1], 1)
        .when(F.col("n_events") < e[2], 2)
        .when(F.col("n_events") < e[3], 3)
        .otherwise(4)
    )
    strata = u.groupBy(band.alias("stratum"), F.col("arm")).agg(
        F.avg(F.col("cents") / 100.0).alias("my"),
        F.count(F.lit(1)).alias("n"),
    )
    t = strata.filter(F.col("arm") == 1).select(
        "stratum", F.col("my").alias("tmy"), F.col("n").alias("tn")
    )
    c = strata.filter(F.col("arm") == 0).select(
        "stratum", F.col("my").alias("cmy"), F.col("n").alias("cn")
    )
    paired = t.join(c, "stratum").select(
        (F.col("tmy") - F.col("cmy")).alias("diff"),
        (F.col("tn") + F.col("cn")).alias("n"),
    )
    return paired.agg(
        F.count(F.lit(1)).alias("n_strata_used"),
        F.sum("n").cast("long").alias("n_users_covered"),
        F.round(
            F.sum(F.col("diff") * F.col("n")) / F.sum("n"), 4
        ).alias("ate_stratified"),
    )


# ===========================================================================
# R672 — James-Stein shrinkage of per-nation means
# ===========================================================================


@register(
    "q_james_stein",
    """
    WITH g AS MATERIALIZED (
      SELECT c_nationkey, AVG(c_acctbal) AS m,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY c_nationkey
    ),
    pool AS MATERIALIZED (
      SELECT AVG(m) AS grand, CAST(COUNT(*) AS BIGINT) AS k,
             SUM((m - (SELECT AVG(m) FROM g))
                 * (m - (SELECT AVG(m) FROM g))) AS s,
             (SELECT AVG(n * 1.0) FROM g) AS nbar
      FROM g
    ),
    varw AS MATERIALIZED (
      SELECT SUM((c_acctbal - g.m) * (c_acctbal - g.m))
             / (COUNT(*) - MIN(pool.k)) AS within_var
      FROM customer JOIN g ON g.c_nationkey = customer.c_nationkey
      CROSS JOIN pool
    ),
    fac AS (
      SELECT pool.grand, pool.k,
             GREATEST(0.0, 1 - (pool.k - 3) * (varw.within_var / pool.nbar)
                                / pool.s) AS shrink
      FROM pool CROSS JOIN varw
    )
    SELECT g.c_nationkey AS nationkey,
           round(g.m, 4) AS raw_mean,
           round(fac.grand + fac.shrink * (g.m - fac.grand), 4) AS js_mean,
           round(fac.shrink, 6) AS shrink_factor
    FROM g CROSS JOIN fac
    ORDER BY g.c_nationkey
    """,
)
def q_james_stein(spark, sf_dir):
    """R672 — James-Stein estimator of the k per-nation mean account
    balances: each raw mean shrinks toward the grand mean by the
    positive-part factor 1 − (k−3)·σ̂²/S with σ̂² = within-nation
    variance over the average group size and S = Σ(m̄ᵢ−m̄)² (the
    equal-variance textbook form — stated simplification).  Dominates
    the raw means in total squared error whenever k ≥ 4; the canonical
    shrinkage the q_target_encoding/q_beta_binomial_eb family builds
    on.  Two keyed aggs + scalar broadcast algebra."""
    cust = read_table(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey").agg(
        F.avg("c_acctbal").alias("m"), F.count(F.lit(1)).alias("n")
    )
    grand = g.agg(
        F.avg("m").alias("grand"),
        F.count(F.lit(1)).alias("k"),
        F.avg(F.col("n") * 1.0).alias("nbar"),
    )
    s = (
        g.crossJoin(F.broadcast(grand))
        .agg(
            F.sum(
                (F.col("m") - F.col("grand")) * (F.col("m") - F.col("grand"))
            ).alias("s")
        )
    )
    varw = (
        cust.join(g.select("c_nationkey", "m"), "c_nationkey")
        .crossJoin(F.broadcast(grand.select("k")))
        .agg(
            (
                F.sum(
                    (F.col("c_acctbal") - F.col("m"))
                    * (F.col("c_acctbal") - F.col("m"))
                )
                / (F.count(F.lit(1)) - F.min("k"))
            ).alias("within_var")
        )
    )
    fac = (
        grand.crossJoin(s)
        .crossJoin(varw)
        .select(
            "grand",
            F.greatest(
                F.lit(0.0),
                1
                - (F.col("k") - 3)
                * (F.col("within_var") / F.col("nbar"))
                / F.col("s"),
            ).alias("shrink"),
        )
    )
    return (
        g.crossJoin(F.broadcast(fac))
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.round("m", 4).alias("raw_mean"),
            F.round(
                F.col("grand") + F.col("shrink") * (F.col("m") - F.col("grand")),
                4,
            ).alias("js_mean"),
            F.round("shrink", 6).alias("shrink_factor"),
        )
        .orderBy("nationkey")
    )


# ===========================================================================
# R673 — beta-binomial empirical Bayes
# ===========================================================================


@register(
    "q_beta_binomial_eb",
    f"""
    WITH {_SQL_USERS},
    rates AS MATERIALIZED (
      SELECT user_id, n_purch AS k, n_events AS n,
             n_purch * 1.0 / n_events AS r
      FROM users WHERE n_events > 0
    ),
    mom AS MATERIALIZED (
      SELECT AVG(r) AS m, var_pop(r) AS v FROM rates
    ),
    ab AS (
      SELECT m * (m * (1 - m) / v - 1) AS alpha,
             (1 - m) * (m * (1 - m) / v - 1) AS beta
      FROM mom
    )
    SELECT rates.user_id,
           round(rates.r, 6) AS raw_rate,
           round((rates.k + ab.alpha)
                 / (rates.n + ab.alpha + ab.beta), 6) AS eb_rate,
           round(ab.alpha, 6) AS alpha, round(ab.beta, 6) AS beta
    FROM rates CROSS JOIN ab
    ORDER BY rates.user_id
    LIMIT 25
    """,
)
def q_beta_binomial_eb(spark, sf_dir):
    """R673 — empirical-Bayes beta-binomial shrinkage of per-user
    purchase rates: method-of-moments prior (α+β = m(1−m)/v − 1,
    α = m(α+β)) from the observed rate mean/variance, posterior rate
    (k+α)/(n+α+β) per user — low-n users shrink hard toward the pool,
    high-n users keep their data.  The per-key-rate smoothing every
    CTR/quality pipeline runs; the first 25 users by id are the
    emitted window (deterministic).  Two aggs + one broadcast."""
    u = _spark_users(spark, sf_dir)
    rates = u.filter(F.col("n_events") > 0).select(
        "user_id",
        F.col("n_purch").alias("k"),
        F.col("n_events").alias("n"),
        (F.col("n_purch") * 1.0 / F.col("n_events")).alias("r"),
    )
    mom = rates.agg(F.avg("r").alias("m"), F.var_pop("r").alias("v"))
    ab = mom.select(
        (F.col("m") * (F.col("m") * (1 - F.col("m")) / F.col("v") - 1)).alias(
            "alpha"
        ),
        (
            (1 - F.col("m"))
            * (F.col("m") * (1 - F.col("m")) / F.col("v") - 1)
        ).alias("beta"),
    )
    return (
        rates.crossJoin(F.broadcast(ab))
        .select(
            "user_id",
            F.round("r", 6).alias("raw_rate"),
            F.round(
                (F.col("k") + F.col("alpha"))
                / (F.col("n") + F.col("alpha") + F.col("beta")),
                6,
            ).alias("eb_rate"),
            F.round("alpha", 6).alias("alpha"),
            F.round("beta", 6).alias("beta"),
        )
        .orderBy("user_id")
        .limit(25)
    )


# ===========================================================================
# R674 — hierarchical win ratio
# ===========================================================================

_WR_CHURN_HOURS = 12


@register(
    "q_win_ratio",
    f"""
    WITH {_SQL_USERS},
    hz AS (SELECT MAX(last_ts) AS mx FROM users),
    st AS MATERIALIZED (
      SELECT user_id, arm, cents,
             CAST(last_ts < (SELECT mx FROM hz)
                            - INTERVAL {_WR_CHURN_HOURS} HOUR AS INT)
               AS churned
      FROM users
    ),{_sql_hash_cap("st")},
    pairs AS (
      SELECT CASE
               WHEN t.churned < c.churned THEN 1
               WHEN t.churned > c.churned THEN -1
               WHEN t.cents > c.cents THEN 1
               WHEN t.cents < c.cents THEN -1
               ELSE 0 END AS o
      FROM (SELECT * FROM s_st WHERE arm = 1) t
      CROSS JOIN (SELECT * FROM s_st WHERE arm = 0) c
    )
    SELECT CAST(SUM(CASE WHEN o = 1 THEN 1 ELSE 0 END) AS BIGINT) AS wins,
           CAST(SUM(CASE WHEN o = -1 THEN 1 ELSE 0 END) AS BIGINT) AS losses,
           CAST(SUM(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties,
           round(SUM(CASE WHEN o = 1 THEN 1 ELSE 0 END) * 1.0
                 / SUM(CASE WHEN o = -1 THEN 1 ELSE 0 END), 4) AS win_ratio
    FROM pairs
    """,
)
def q_win_ratio(spark, sf_dir):
    """R674 — hierarchical win ratio (Pocock) between the arms: every
    treated×control pair compares first on the more-serious endpoint
    (churn — NOT churning wins), then on purchase cents; WR =
    wins/losses with ties reported.  All comparisons integer-exact;
    pairs over the user dimension under q_cindex's deterministic
    portable-hash sample cap (spark_hash_cap/_sql_hash_cap,
    registry_ext228) — pair stage <= CAP^2 at ANY corpus size, no
    broadcast hint on the pair join (AQE decides, the ext220 rule)."""
    u = _spark_users(spark, sf_dir)
    hz = u.agg(F.max("last_ts").alias("mx"))
    st = u.crossJoin(F.broadcast(hz)).select(
        "user_id",
        "arm",
        "cents",
        (
            F.col("last_ts")
            < F.col("mx") - F.expr(f"INTERVAL {_WR_CHURN_HOURS} HOUR")
        )
        .cast("int")
        .alias("churned"),
    )
    st = spark_hash_cap(st)
    t = st.filter(F.col("arm") == 1).select(
        F.col("cents").alias("tc"), F.col("churned").alias("tch")
    )
    c = st.filter(F.col("arm") == 0).select(
        F.col("cents").alias("cc"), F.col("churned").alias("cch")
    )
    o = (
        F.when(F.col("tch") < F.col("cch"), 1)
        .when(F.col("tch") > F.col("cch"), -1)
        .when(F.col("tc") > F.col("cc"), 1)
        .when(F.col("tc") < F.col("cc"), -1)
        .otherwise(0)
    )
    pairs = t.crossJoin(c).select(o.alias("o"))
    return pairs.agg(
        F.sum(F.when(F.col("o") == 1, 1).otherwise(0))
        .cast("long")
        .alias("wins"),
        F.sum(F.when(F.col("o") == -1, 1).otherwise(0))
        .cast("long")
        .alias("losses"),
        F.sum(F.when(F.col("o") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ties"),
        F.round(
            F.sum(F.when(F.col("o") == 1, 1).otherwise(0))
            * 1.0
            / F.sum(F.when(F.col("o") == -1, 1).otherwise(0)),
            4,
        ).alias("win_ratio"),
    )
