"""Round-7 registry additions, batch 171 — forecasting, privacy and
regression-eval completions:

- q_theta_forecast: the Theta method (M3-competition winner) on the
  daily purchase-count series — OLS trend line (closed-form integer
  sums) + SES of the theta=2 line. The SES level uses the CLOSED
  geometric-weight form (one weighted sum with day-index exponents),
  not a sequential recursion — the q_ewma_chart discipline — over a
  calendar-bounded day frame.
- q_power_analysis: two-proportion sample-size calculator — per-arm n
  for a grid of minimum detectable effects at α = 0.05 / power = 0.8,
  from the corpus's observed conversion rate, with z-quantiles from
  the shared BSM probit (registry_ext173) so both engines compute
  the identical closed form. The question every A/B test asks BEFORE
  q_ab_test / q_srm_check run.
- q_regression_metrics: RMSE / MAE / R² / MAPE of a stated
  fixed-weight hour-of-day predictor against purchase values — the
  eval sheet every regression ships (the q_ols_2var FIT has no
  goodness-of-fit readout until now).

At 100 TB: theta is one day rollup (calendar-bounded) + closed-form
sums; power analysis is one 1-row rate agg against a literal grid;
regression metrics are a single conditional agg.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.sources.tables import read_events

_TH_ALPHA = 0.3      # SES smoothing for the theta=2 line
_TH_H = 3            # forecast horizon (days)
_RM_B0, _RM_B1 = 150.0, 8.0   # fixed hour-of-day predictor


# ===========================================================================
# R510 — Theta-method forecast
# ===========================================================================

@register(
    "q_theta_forecast",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    idx AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    ols AS (
      SELECT n,
             (SUM(t * y) - SUM(t) * SUM(y) / n)
               / (SUM(t * t) - SUM(t) * SUM(t) / n) AS b,
             SUM(y) / n - (SUM(t * y) - SUM(t) * SUM(y) / n)
               / (SUM(t * t) - SUM(t) * SUM(t) / n) * SUM(t) / n AS a
      FROM idx GROUP BY n
    ),
    ses AS (
      SELECT SUM(CASE WHEN t = 1
                 THEN power(1.0 - {_TH_ALPHA}, idx.n - 1)
                      * (2.0 * y - (ols.a + ols.b * t))
                 ELSE {_TH_ALPHA} * power(1.0 - {_TH_ALPHA}, idx.n - t)
                      * (2.0 * y - (ols.a + ols.b * t)) END) AS level,
             MAX(idx.n) AS n
      FROM idx CROSS JOIN ols
    )
    SELECT h,
           round(0.5 * (ols.a + ols.b * (ses.n + h))
                 + 0.5 * ses.level, 6) AS forecast,
           round(ols.a, 6) AS trend_a, round(ols.b, 6) AS trend_b,
           round(ses.level, 6) AS ses_level
    FROM (SELECT UNNEST([1, 2, 3]) AS h) CROSS JOIN ols CROSS JOIN ses
    ORDER BY h
    """,
)
def q_theta_forecast(spark, sf_dir):
    """R510 — Theta-method forecast of daily purchase counts:
    0.5 × (OLS trend extrapolation) + 0.5 × (SES level of the theta=2
    line, α = {a}). The SES level is the CLOSED geometric form
    l_n = Σ_j w_j·θ2_j with w_j = α(1−α)^(n−j) (j>1) and (1−α)^(n−1)
    for j = 1 — one weighted sum, no sequential recursion. The day
    index is a calendar-bounded window (≤ the series' day count, the
    q_croston class). Forecast horizon h = 1..{h}.""".format(
        a=_TH_ALPHA, h=_TH_H
    )
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    w = Window.orderBy("d")
    idx = daily.select(
        "y", F.row_number().over(w).alias("t")
    )
    n_w = idx.agg(F.max("t").alias("n"))
    idx = idx.crossJoin(F.broadcast(n_w))
    sums = idx.agg(
        F.max("n").alias("n"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    b = (F.col("sty") - F.col("st") * F.col("sy") / F.col("n")) / (
        F.col("stt") - F.col("st") * F.col("st") / F.col("n")
    )
    ols = sums.select("n", b.alias("b"), (
        F.col("sy") / F.col("n") - b * F.col("st") / F.col("n")
    ).alias("a"))
    j = idx.crossJoin(F.broadcast(ols.select("a", "b")))
    theta2 = 2.0 * F.col("y") - (F.col("a") + F.col("b") * F.col("t"))
    wgt = F.when(
        F.col("t") == 1, F.pow(1.0 - _TH_ALPHA, F.col("n") - 1)
    ).otherwise(
        _TH_ALPHA * F.pow(1.0 - _TH_ALPHA, F.col("n") - F.col("t"))
    )
    ses = j.agg(
        F.sum(wgt * theta2).alias("level"), F.max("n").alias("n")
    )
    hs = spark.createDataFrame([(h,) for h in (1, 2, 3)], "h int")
    return (
        hs.crossJoin(F.broadcast(ols.select("a", "b")))
        .crossJoin(F.broadcast(ses))
        .select(
            "h",
            F.round(
                0.5 * (F.col("a") + F.col("b") * (F.col("n") + F.col("h")))
                + 0.5 * F.col("level"),
                6,
            ).alias("forecast"),
            F.round("a", 6).alias("trend_a"),
            F.round("b", 6).alias("trend_b"),
            F.round("level", 6).alias("ses_level"),
        )
        .orderBy("h")
    )


# ===========================================================================
# R511 — two-proportion power analysis (sample-size grid)
# ===========================================================================

_PA_ALPHA_Q = 0.975   # two-sided alpha = 0.05
_PA_POWER_Q = 0.8
_PA_DELTAS = (0.01, 0.02, 0.05)


from arrow_supercluster_spark.plans.registry_ext173 import (  # noqa: E402
    bsm_probit_col,
    bsm_probit_sql,
)


@register(
    "q_power_analysis",
    f"""
    WITH base AS (
      SELECT AVG(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END)
               AS p1
      FROM events
    ),
    grid AS (SELECT UNNEST([{', '.join(str(d) for d in _PA_DELTAS)}]) AS mde),
    z AS (
      SELECT {bsm_probit_sql(str(_PA_ALPHA_Q))} AS za,
             {bsm_probit_sql(str(_PA_POWER_Q))} AS zb
    )
    SELECT grid.mde, round(base.p1, 6) AS baseline_rate,
           CAST(ceil(
             power(z.za * sqrt(2.0 * ((base.p1 + base.p1 + grid.mde) / 2.0)
                               * (1.0 - (base.p1 + base.p1 + grid.mde) / 2.0))
                   + z.zb * sqrt(base.p1 * (1.0 - base.p1)
                                 + (base.p1 + grid.mde)
                                   * (1.0 - base.p1 - grid.mde)), 2)
             / (grid.mde * grid.mde)) AS BIGINT) AS n_per_arm
    FROM grid CROSS JOIN base CROSS JOIN z
    ORDER BY grid.mde
    """,
)
def q_power_analysis(spark, sf_dir):
    """R511 — two-proportion sample-size calculator: per-arm n to
    detect each minimum-detectable-effect in {g} over the corpus's
    observed purchase-event rate p1, two-sided α = 0.05, power = 0.8,
    via the standard normal-approximation closed form
    n = (z_{{α/2}}·√(2·p̄·q̄) + z_β·√(p1·q1 + p2·q2))² / δ². The z
    quantiles come from the SHARED BSM probit (registry_ext173) so
    both engines evaluate identical IEEE arithmetic. The planning
    step that precedes q_ab_test / q_srm_check / q_cuped. Plan: one
    1-row rate agg cross-joined with a literal MDE grid.""".format(
        g=_PA_DELTAS
    )
    ev = read_events(spark, sf_dir)
    base = ev.agg(
        F.avg(
            F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0)
        ).alias("p1")
    )
    za = bsm_probit_col(F.lit(_PA_ALPHA_Q))
    zb = bsm_probit_col(F.lit(_PA_POWER_Q))
    grid = spark.createDataFrame(
        [(d,) for d in _PA_DELTAS], "mde double"
    )
    p1 = F.col("p1")
    p2 = p1 + F.col("mde")
    pbar = (p1 + p2) / 2.0
    n = F.ceil(
        F.pow(
            za * F.sqrt(2.0 * pbar * (1.0 - pbar))
            + zb * F.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)),
            2,
        )
        / (F.col("mde") * F.col("mde"))
    ).cast("long")
    return (
        grid.crossJoin(F.broadcast(base))
        .select(
            "mde",
            F.round(p1, 6).alias("baseline_rate"),
            n.alias("n_per_arm"),
        )
        .orderBy("mde")
    )


# ===========================================================================
# R512 — regression goodness-of-fit metrics
# ===========================================================================

@register(
    "q_regression_metrics",
    f"""
    WITH pv AS (
      SELECT value AS y,
             {_RM_B0} + {_RM_B1} * CAST(hour(ts) AS DOUBLE) AS yhat
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL AND value > 0
    ),
    base AS (SELECT AVG(y) AS ybar FROM pv)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           round(sqrt(AVG((y - yhat) * (y - yhat))), 6) AS rmse,
           round(AVG(abs(y - yhat)), 6) AS mae,
           round(1.0 - SUM((y - yhat) * (y - yhat))
                 / SUM((y - base.ybar) * (y - base.ybar)), 6) AS r2,
           round(AVG(abs(y - yhat) / y), 6) AS mape
    FROM pv CROSS JOIN base
    """,
)
def q_regression_metrics(spark, sf_dir):
    """R512 — the regression eval sheet for a stated fixed predictor
    ŷ = {b0} + {b1}·hour(ts) of purchase values: RMSE, MAE, R²
    (vs the mean baseline), MAPE (positive actuals only, stated
    filter). A deliberately bad predictor — R² near or below 0 — so
    the metrics READ as diagnostics, not as a fit claim; the fitting
    itself lives in q_ols_2var / q_huber_irls. One conditional agg
    plus a broadcast 1-row mean.""".format(b0=_RM_B0, b1=_RM_B1)
    ev = read_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & (F.col("value") > 0)
    )
    pv = ev.select(
        F.col("value").alias("y"),
        (_RM_B0 + _RM_B1 * F.hour("ts").cast("double")).alias("yhat"),
    )
    base = pv.agg(F.avg("y").alias("ybar"))
    e = F.col("y") - F.col("yhat")
    d = F.col("y") - F.col("ybar")
    return pv.crossJoin(F.broadcast(base)).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sqrt(F.avg(e * e)), 6).alias("rmse"),
        F.round(F.avg(F.abs(e)), 6).alias("mae"),
        F.round(1.0 - F.sum(e * e) / F.sum(d * d), 6).alias("r2"),
        F.round(F.avg(F.abs(e) / F.col("y")), 6).alias("mape"),
    )
