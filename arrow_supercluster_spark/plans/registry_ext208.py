"""Round-7 registry additions, batch 203 — survival completions +
seasonal-strength diagnostics:

- q_nelson_aalen: the Nelson-Aalen cumulative hazard Ĥ(t) = Σ d_i/n_i
  with Aalen's variance Σ d_i/n_i² over the SAME lifetime/churn
  construction q_kaplan_meier (R) uses — the estimator of choice when
  hazards, not survival, are the modeling target.  exp(−Ĥ) ≥ KM
  survival pointwise (Jensen) — asserted in tests.
- q_rmst: restricted mean survival time ∫₀^τ Ŝ(t)dt at τ = 21 days,
  per user-parity arm — the recommended effect summary when hazards
  cross; exact step-function integration of the per-arm KM curve.
- q_seasonality_strength: Wang-Hyndman strengths on daily purchases —
  trend = ±3-day window mean, seasonal = weekday mean of the
  detrended series, F_t = max(0, 1 − Var(R)/Var(T+R)), F_s = max(0,
  1 − Var(R)/Var(S+R)) (population variances, stated).

At 100 TB: lifetimes are one user collapse; every curve/strength
computation lives on the ≤|distinct lifetime days| / ≤31-day frames
via bounded self-joins (no global windows added); variance sums run
as fixed-order folds by day.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_KM_CHURN_DAYS = 7  # same horizon rule as q_kaplan_meier
_RMST_TAU = 21
_SS_RADIUS = 3

_SQL_LIFE = f"""
    horizon AS (SELECT MAX(epoch_us(ts)) AS h_us FROM events),
    lifetimes AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(floor((MAX(epoch_us(ts)) - MIN(epoch_us(ts)))
                        / 86400000000.0) AS BIGINT) AS t_days,
             CAST(MAX(epoch_us(ts))
                  < (SELECT h_us FROM horizon)
                    - {_KM_CHURN_DAYS} * 86400000000
                  AS INTEGER) AS died
      FROM events GROUP BY user_id
    )
"""


def _spark_lifetimes(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    horizon = ev.agg(F.max(F.unix_micros("ts")).alias("h_us"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.floor(
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
                / 86400000000.0
            )
            .cast("long")
            .alias("t_days"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.pmod("user_id", F.lit(2)).alias("arm"),
            "t_days",
            (
                F.col("last_us")
                < F.col("h_us") - _KM_CHURN_DAYS * 86400000000
            )
            .cast("int")
            .alias("died"),
        )
    )


# ===========================================================================
# R605 — Nelson-Aalen cumulative hazard
# ===========================================================================

@register(
    "q_nelson_aalen",
    f"""
    WITH {_SQL_LIFE},
    risk0 AS (
      SELECT t_days, CAST(SUM(died) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM lifetimes GROUP BY 1
    ),
    risk AS (
      SELECT a.t_days, MAX(a.d) AS d,
             CAST(SUM(b.leaving) AS BIGINT) AS at_risk
      FROM risk0 a JOIN risk0 b ON b.t_days >= a.t_days
      GROUP BY a.t_days
    )
    SELECT a.t_days, MAX(a.d) AS d, MAX(a.at_risk) AS at_risk,
           round(SUM(CAST(b.d AS DOUBLE) / b.at_risk), 6)
             AS na_cumhaz,
           round(sqrt(SUM(CAST(b.d AS DOUBLE)
                          / (CAST(b.at_risk AS DOUBLE) * b.at_risk))),
                 6) AS na_se
    FROM risk a JOIN risk b ON b.t_days <= a.t_days
    GROUP BY a.t_days
    ORDER BY a.t_days
    """,
)
def q_nelson_aalen(spark, sf_dir):
    """R605 — Ĥ(t) = Σ_{{t_i≤t}} d_i/n_i, SE = √Σ d_i/n_i² — at-risk
    counts and the cumulative sums via bounded self-joins on the
    distinct-lifetime frame (no global windows)."""
    lt = _spark_lifetimes(spark, sf_dir)
    risk0 = lt.groupBy("t_days").agg(
        F.sum("died").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    b0 = risk0.select(
        F.col("t_days").alias("bt"), F.col("leaving").alias("bl")
    )
    risk = (
        risk0.join(b0, F.col("bt") >= F.col("t_days"))
        .groupBy("t_days")
        .agg(F.max("d").alias("d"), F.sum("bl").alias("at_risk"))
    )
    b = risk.select(
        F.col("t_days").alias("ct"),
        F.col("d").alias("cd"),
        F.col("at_risk").alias("cn"),
    )
    return (
        risk.join(b, F.col("ct") <= F.col("t_days"))
        .groupBy("t_days")
        .agg(
            F.max("d").alias("d"),
            F.max("at_risk").alias("at_risk"),
            F.round(
                F.sum(F.col("cd").cast("double") / F.col("cn")), 6
            ).alias("na_cumhaz"),
            F.round(
                F.sqrt(
                    F.sum(
                        F.col("cd").cast("double")
                        / (F.col("cn").cast("double") * F.col("cn"))
                    )
                ),
                6,
            ).alias("na_se"),
        )
        .orderBy("t_days")
    )


# ===========================================================================
# R606 — restricted mean survival time per arm
# ===========================================================================

@register(
    "q_rmst",
    f"""
    WITH {_SQL_LIFE},
    risk0 AS (
      SELECT arm, t_days, CAST(SUM(died) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM lifetimes GROUP BY 1, 2
    ),
    risk AS (
      SELECT a.arm, a.t_days, MAX(a.d) AS d,
             CAST(SUM(b.leaving) AS BIGINT) AS at_risk
      FROM risk0 a JOIN risk0 b
        ON b.arm = a.arm AND b.t_days >= a.t_days
      GROUP BY 1, 2
    ),
    surv AS (
      SELECT a.arm, a.t_days,
             exp(SUM(CASE WHEN b.d > 0 AND b.d < b.at_risk
                          THEN ln(1.0 - CAST(b.d AS DOUBLE) / b.at_risk)
                          ELSE 0.0 END)) AS s
      FROM risk a JOIN risk b
        ON b.arm = a.arm AND b.t_days <= a.t_days
      GROUP BY 1, 2
    ),
    nxt AS (
      SELECT s.arm, s.t_days, s.s,
             COALESCE(MIN(o.t_days), {_RMST_TAU}) AS t_next
      FROM surv s LEFT JOIN surv o
        ON o.arm = s.arm AND o.t_days > s.t_days
      GROUP BY 1, 2, 3
    ),
    segs AS (
      -- S = 1 on [0, first event time)
      SELECT arm,
             LEAST(MIN(t_days), {_RMST_TAU}) * 1.0 AS area
      FROM surv GROUP BY arm
      UNION ALL
      SELECT arm,
             s * (LEAST(t_next, {_RMST_TAU})
                  - LEAST(t_days, {_RMST_TAU})) AS area
      FROM nxt
    ),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM lifetimes GROUP BY 1
    )
    SELECT a.arm, a.n_users, {_RMST_TAU} AS tau,
           round(SUM(s.area), 4) AS rmst
    FROM arms a JOIN segs s ON s.arm = a.arm
    GROUP BY 1, 2 ORDER BY a.arm
    """,
)
def q_rmst(spark, sf_dir):
    """R606 — RMST(τ=21d) per user-parity arm: exact step integration
    of the per-arm KM curve (S=1 before the first event time; each
    step contributes S·(min(t_next,τ) − min(t,τ))).  KM products run
    as exp-of-summed-logs over bounded per-arm self-joins."""
    lt = _spark_lifetimes(spark, sf_dir)
    risk0 = lt.groupBy("arm", "t_days").agg(
        F.sum("died").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    b0 = risk0.select(
        F.col("arm").alias("ba"),
        F.col("t_days").alias("bt"),
        F.col("leaving").alias("bl"),
    )
    risk = (
        risk0.join(
            b0,
            (F.col("ba") == F.col("arm"))
            & (F.col("bt") >= F.col("t_days")),
        )
        .groupBy("arm", "t_days")
        .agg(F.max("d").alias("d"), F.sum("bl").alias("at_risk"))
    )
    c = risk.select(
        F.col("arm").alias("ca"),
        F.col("t_days").alias("ct"),
        F.col("d").alias("cd"),
        F.col("at_risk").alias("cn"),
    )
    surv = (
        risk.join(
            c,
            (F.col("ca") == F.col("arm"))
            & (F.col("ct") <= F.col("t_days")),
        )
        .groupBy("arm", "t_days")
        .agg(
            F.exp(
                F.sum(
                    F.when(
                        (F.col("cd") > 0) & (F.col("cd") < F.col("cn")),
                        F.log(
                            1.0
                            - F.col("cd").cast("double") / F.col("cn")
                        ),
                    ).otherwise(0.0)
                )
            ).alias("s")
        )
    )
    o = surv.select(
        F.col("arm").alias("oa"), F.col("t_days").alias("ot")
    )
    nxt = (
        surv.join(
            o,
            (F.col("oa") == F.col("arm"))
            & (F.col("ot") > F.col("t_days")),
            "left",
        )
        .groupBy("arm", "t_days", "s")
        .agg(
            F.coalesce(F.min("ot"), F.lit(_RMST_TAU)).alias("t_next")
        )
    )
    head = surv.groupBy("arm").agg(
        (F.least(F.min("t_days"), F.lit(_RMST_TAU)) * 1.0).alias(
            "area"
        )
    )
    steps = nxt.select(
        "arm",
        (
            F.col("s")
            * (
                F.least(F.col("t_next"), F.lit(_RMST_TAU))
                - F.least(F.col("t_days"), F.lit(_RMST_TAU))
            )
        ).alias("area"),
    )
    segs = head.unionByName(steps)
    arms = lt.groupBy("arm").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        arms.join(segs, "arm")
        .groupBy("arm", "n_users")
        .agg(F.round(F.sum("area"), 4).alias("rmst"))
        .select("arm", "n_users", F.lit(_RMST_TAU).alias("tau"), "rmst")
        .orderBy("arm")
    )


# ===========================================================================
# R607 — Wang-Hyndman trend / seasonality strength
# ===========================================================================

@register(
    "q_seasonality_strength",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             EXTRACT(dow FROM CAST(ts AS DATE)) AS wd,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    trend AS (
      SELECT a.d, MAX(a.wd) AS wd, MAX(a.x) AS x, AVG(b.x) AS t
      FROM daily a JOIN daily b
        ON abs(CAST(b.d - a.d AS BIGINT)) <= {_SS_RADIUS}
      GROUP BY a.d
    ),
    season AS (
      SELECT wd, AVG(x - t) AS s FROM trend GROUP BY 1
    ),
    comp AS (
      SELECT tr.d, tr.x, tr.t, se.s,
             tr.x - tr.t - se.s AS r
      FROM trend tr JOIN season se ON se.wd = tr.wd
    ),
    folds AS (
      SELECT
        list_aggregate(list(r ORDER BY d), 'sum') AS s_r,
        list_aggregate(list_transform(list(r ORDER BY d),
                                      v -> v * v), 'sum') AS ss_r,
        list_aggregate(list(t + r ORDER BY d), 'sum') AS s_tr,
        list_aggregate(list_transform(list(t + r ORDER BY d),
                                      v -> v * v), 'sum') AS ss_tr,
        list_aggregate(list(s + r ORDER BY d), 'sum') AS s_sr,
        list_aggregate(list_transform(list(s + r ORDER BY d),
                                      v -> v * v), 'sum') AS ss_sr,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM comp
    )
    SELECT n,
           round(GREATEST(0.0, 1.0 - (ss_r / n - (s_r / n) * (s_r / n))
                 / (ss_tr / n - (s_tr / n) * (s_tr / n))), 6)
             AS trend_strength,
           round(GREATEST(0.0, 1.0 - (ss_r / n - (s_r / n) * (s_r / n))
                 / (ss_sr / n - (s_sr / n) * (s_sr / n))), 6)
             AS seasonal_strength
    FROM folds
    """,
)
def q_seasonality_strength(spark, sf_dir):
    """R607 — F_t = max(0, 1 − Var(R)/Var(T+R)), F_s = max(0, 1 −
    Var(R)/Var(S+R)) (population variances): trend = ±3-day window
    mean, seasonal = weekday mean of the detrended series, R the
    leftover.  Variance sums fold in day order in both engines."""
    ev = read_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.to_date("ts").alias("d"),
            F.dayofweek("ts").alias("wd"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    trend = (
        daily.join(
            b, F.abs(F.datediff(F.col("bd"), F.col("d"))) <= _SS_RADIUS
        )
        .groupBy("d")
        .agg(
            F.max("wd").alias("wd"),
            F.max("x").alias("x"),
            F.avg("bx").alias("t"),
        )
    )
    season = trend.groupBy("wd").agg(
        F.avg(F.col("x") - F.col("t")).alias("s")
    )
    r = F.col("x") - F.col("t") - F.col("s")
    comp = trend.join(F.broadcast(season), "wd").select(
        "d",
        r.alias("r"),
        (F.col("t") + r).alias("tr"),
        (F.col("s") + r).alias("sr"),
    )

    def fold(field):
        lst = F.transform(
            F.sort_array(
                F.collect_list(F.struct("d", "r", "tr", "sr"))
            ),
            lambda s: s[field],
        )
        return (
            F.aggregate(lst, F.lit(0.0), lambda a, x: a + x),
            F.aggregate(
                F.transform(lst, lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )

    s_r, ss_r = fold("r")
    s_tr, ss_tr = fold("tr")
    s_sr, ss_sr = fold("sr")
    folds = comp.agg(
        s_r.alias("s_r"),
        ss_r.alias("ss_r"),
        s_tr.alias("s_tr"),
        ss_tr.alias("ss_tr"),
        s_sr.alias("s_sr"),
        ss_sr.alias("ss_sr"),
        F.count(F.lit(1)).alias("n"),
    )

    def var(s, ss):
        return F.col(ss) / F.col("n") - (F.col(s) / F.col("n")) * (
            F.col(s) / F.col("n")
        )

    return folds.select(
        "n",
        F.round(
            F.greatest(
                F.lit(0.0), 1.0 - var("s_r", "ss_r") / var("s_tr", "ss_tr")
            ),
            6,
        ).alias("trend_strength"),
        F.round(
            F.greatest(
                F.lit(0.0), 1.0 - var("s_r", "ss_r") / var("s_sr", "ss_sr")
            ),
            6,
        ).alias("seasonal_strength"),
    )
