"""Round-6 registry additions, batch 150 — prediction-quality metrics
that complete existing model families:

- q_harrell_c: Harrell's concordance index for the user purchase-churn
  survival setup — risk score (first-10-day purchase count) vs observed
  purchase-span duration with window-edge censoring; C = P(higher risk ⇒ shorter survival) over
  comparable pairs (ties in risk count ½). The discrimination metric
  for q_kaplan_meier / q_logrank_test's time-to-event world, where
  q_auc is wrong because censored users have no label.
- q_brier_decomposition: Murphy decomposition of the Brier score for
  the deterministic-hash probability predictor — reliability −
  resolution + uncertainty over 10 prediction bins, with the exact
  identity (binned) and the raw Brier side by side. q_calibration
  plots the reliability curve; this turns it into the three numbers
  that say WHY the score is what it is.
- q_theils_u: Theil's U2 — the trend model's one-step forecasts
  against the naive y_{{t−1}} forecast on relative errors. U2 < 1 is
  the only honest "the model beats persistence" claim; every forecast
  query (q_holt_linear, q_forecast_backtest) should be read against
  it.

At 100 TB: Harrell's C pairs COHORT-level survival rows (users
collapse to one row each first — the pair stage is user² not event²,
and at the demo grain it is exact); Brier and U2 collapse to ≤10 bins
/ ≤31 days before any arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_HC_CHURN_DAY = 28  # last event before this day => churn observed
_H_MULT, _H_MOD = 48271, 65537  # portable hash (shared with ext95)
_BD_BINS = 10


# ===========================================================================
# R443 — Harrell's concordance index
# ===========================================================================

_SQL_SURV = f"""
    surv AS (
      SELECT user_id,
             CAST(MAX(CAST(strftime(ts, '%d') AS INTEGER))
                  - MIN(CAST(strftime(ts, '%d') AS INTEGER)) AS BIGINT)
               AS duration,
             CAST(MAX(CAST(strftime(ts, '%d') AS INTEGER))
                  < {_HC_CHURN_DAY} AS INTEGER) AS churned,
             CAST(SUM(CASE WHEN CAST(strftime(ts, '%d') AS INTEGER) <= 10
                           THEN 1 ELSE 0 END) AS BIGINT) AS risk
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
"""


@register(
    "q_harrell_c",
    f"""
    WITH {_SQL_SURV},
    pairs AS (
      SELECT a.risk AS ra, b.risk AS rb
      FROM surv a JOIN surv b
        ON a.duration < b.duration AND a.churned = 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_comparable,
             SUM(CASE WHEN ra > rb THEN 1.0
                      WHEN ra = rb THEN 0.5 ELSE 0.0 END) AS conc
      FROM pairs
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_users,
           (SELECT CAST(SUM(churned) AS BIGINT) FROM surv) AS n_churned,
           s.n_comparable,
           round(s.conc / s.n_comparable, 6) AS harrell_c
    FROM s
    """,
)
def q_harrell_c(spark, sf_dir):
    """R443 — Harrell's C over the user PURCHASE-churn frame: duration =
    purchase-span in days, churn observed iff the last purchase lands
    before day {d} (later users are right-censored by the window
    edge), risk = first-10-day purchase count. A pair is comparable iff the
    shorter-duration member's churn was OBSERVED (censored users
    bound survival from below only); concordant when the
    shorter-lived user carried the higher risk, ties in risk ½.
    Pairs form on the per-user table (corpus collapses first), so the
    quadratic stage is user-level and the demo grain is exact — at
    scale the same statistic estimates from a user sample, like
    q_auc's ranking form.""".format(d=_HC_CHURN_DAY)
    ev = read_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    d = F.dayofmonth("ts")
    surv = ev.groupBy("user_id").agg(
        (F.max(d) - F.min(d)).cast("long").alias("duration"),
        (F.max(d) < _HC_CHURN_DAY).cast("int").alias("churned"),
        F.sum(F.when(d <= 10, 1).otherwise(0)).cast("long").alias("risk"),
    )
    a = surv.select(
        F.col("duration").alias("da"),
        F.col("churned").alias("ca"),
        F.col("risk").alias("ra"),
    )
    b = surv.select(
        F.col("duration").alias("db"), F.col("risk").alias("rb")
    )
    pairs = a.join(
        b, (F.col("da") < F.col("db")) & (F.col("ca") == 1)
    )
    s = pairs.agg(
        F.count(F.lit(1)).alias("n_comparable"),
        F.sum(
            F.when(F.col("ra") > F.col("rb"), 1.0)
            .when(F.col("ra") == F.col("rb"), 0.5)
            .otherwise(0.0)
        ).alias("conc"),
    )
    tot = surv.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("churned").cast("long").alias("n_churned"),
    )
    return tot.crossJoin(F.broadcast(s)).select(
        F.col("n_users").cast("long"),
        "n_churned",
        F.col("n_comparable").cast("long"),
        F.round(F.col("conc") / F.col("n_comparable"), 6).alias(
            "harrell_c"
        ),
    )


# ===========================================================================
# R444 — Brier score Murphy decomposition
# ===========================================================================

@register(
    "q_brier_decomposition",
    f"""
    WITH scored AS (
      SELECT ((user_id * {_H_MULT}) % {_H_MOD}) * 1.0 / {_H_MOD} AS p,
             CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 90
                           THEN 1 ELSE 0 END) AS INTEGER) AS y
      FROM events GROUP BY user_id
    ),
    binned AS (
      SELECT CAST(floor(p * {_BD_BINS}) AS INTEGER) AS b, p, y
      FROM scored
    ),
    cells AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS nk,
             AVG(p) AS pk, AVG(y * 1.0) AS ok
      FROM binned GROUP BY b
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(y * 1.0) AS obar,
             AVG((p - y) * (p - y)) AS brier_raw
      FROM binned
    ),
    dec AS (
      SELECT SUM(nk * (pk - ok) * (pk - ok)) / tot.n AS reliability,
             SUM(nk * (ok - tot.obar) * (ok - tot.obar)) / tot.n
               AS resolution
      FROM cells CROSS JOIN tot GROUP BY tot.n, tot.obar
    )
    SELECT tot.n AS n_users,
           round(tot.brier_raw, 6) AS brier_raw,
           round(dec.reliability, 6) AS reliability,
           round(dec.resolution, 6) AS resolution,
           round(tot.obar * (1 - tot.obar), 6) AS uncertainty,
           round(dec.reliability - dec.resolution
                 + tot.obar * (1 - tot.obar), 6) AS brier_binned
    FROM tot CROSS JOIN dec
    """,
)
def q_brier_decomposition(spark, sf_dir):
    """R444 — Murphy decomposition over the deterministic-hash
    probability predictor (the q_isotonic_calibration setup):
    reliability = Σn_k(p̄_k−ō_k)²/n (calibration error, lower better),
    resolution = Σn_k(ō_k−ō)²/n (discrimination, higher better),
    uncertainty = ō(1−ō). brier_binned = rel − res + unc satisfies the
    identity exactly for bin-mean predictions; brier_raw differs by
    the within-bin variance of p — both shipped so the gap is
    visible. ≤{b} cells; corpus collapses per user first.""".format(
        b=_BD_BINS
    )
    ev = read_events(spark, sf_dir)
    scored = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90),
                1,
            ).otherwise(0)
        ).cast("int").alias("y")
    ).select(
        (((F.col("user_id") * _H_MULT) % _H_MOD) * 1.0 / _H_MOD).alias("p"),
        "y",
    )
    binned = scored.select(
        F.floor(F.col("p") * _BD_BINS).cast("int").alias("b"), "p", "y"
    )
    cells = binned.groupBy("b").agg(
        F.count(F.lit(1)).alias("nk"),
        F.avg("p").alias("pk"),
        F.avg(F.col("y") * 1.0).alias("ok"),
    )
    tot = binned.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("y") * 1.0).alias("obar"),
        F.avg(
            (F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))
        ).alias("brier_raw"),
    )
    dec = cells.crossJoin(F.broadcast(tot)).agg(
        (
            F.sum(
                F.col("nk") * (F.col("pk") - F.col("ok"))
                * (F.col("pk") - F.col("ok"))
            ) / F.max("n")
        ).alias("reliability"),
        (
            F.sum(
                F.col("nk") * (F.col("ok") - F.col("obar"))
                * (F.col("ok") - F.col("obar"))
            ) / F.max("n")
        ).alias("resolution"),
    )
    return tot.crossJoin(F.broadcast(dec)).select(
        F.col("n").cast("long").alias("n_users"),
        F.round("brier_raw", 6).alias("brier_raw"),
        F.round("reliability", 6).alias("reliability"),
        F.round("resolution", 6).alias("resolution"),
        F.round(F.col("obar") * (1 - F.col("obar")), 6).alias(
            "uncertainty"
        ),
        F.round(
            F.col("reliability") - F.col("resolution")
            + F.col("obar") * (1 - F.col("obar")),
            6,
        ).alias("brier_binned"),
    )


# ===========================================================================
# R445 — Theil's U2 forecast-quality ratio
# ===========================================================================

@register(
    "q_theils_u",
    """
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    reg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(d) AS sx, SUM(c) AS sy,
             SUM(d * c) AS sxy, SUM(d * d) AS sxx
      FROM daily
    ),
    fit AS (
      SELECT (sxy - sx * 1.0 * sy / n) / (sxx - sx * 1.0 * sx / n)
               AS slope,
             sy * 1.0 / n
               - (sxy - sx * 1.0 * sy / n) / (sxx - sx * 1.0 * sx / n)
                 * (sx * 1.0 / n) AS b0
      FROM reg
    ),
    steps AS (
      SELECT cur.d, cur.c AS y, prev.c AS y_prev,
             fit.b0 + fit.slope * cur.d AS f
      FROM daily cur
      JOIN daily prev ON prev.d = cur.d - 1
      CROSS JOIN fit
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_steps,
             SUM(((f - y) / y_prev) * ((f - y) / y_prev)) AS se_model,
             SUM(((y - y_prev) * 1.0 / y_prev)
                 * ((y - y_prev) * 1.0 / y_prev)) AS se_naive
      FROM steps
    )
    SELECT n_steps,
           round(sqrt(se_model / n_steps), 6) AS rrmse_model,
           round(sqrt(se_naive / n_steps), 6) AS rrmse_naive,
           round(sqrt(se_model / se_naive), 6) AS theils_u2,
           sqrt(se_model / se_naive) < 1 AS beats_naive
    FROM s
    """,
)
def q_theils_u(spark, sf_dir):
    """R445 — Theil's U2 on the daily-count series: the OLS trend's
    in-sample one-step forecasts vs the naive persistence forecast
    y_{t−1}, on RELATIVE errors (each step scaled by y_{t−1}).
    U2 < 1 ⇔ the model genuinely beats persistence — the bar every
    forecasting query must clear before its RMSE means anything.
    Exact integer regression sums; ≤31-row frame; the adjacent-day
    join is the same calendar-bounded shape as q_durbin_watson."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    reg = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("sx"),
        F.sum("c").alias("sy"),
        F.sum(F.col("d") * F.col("c")).alias("sxy"),
        F.sum(F.col("d") * F.col("d")).alias("sxx"),
    )
    slope = (
        F.col("sxy") - F.col("sx") * 1.0 * F.col("sy") / F.col("n")
    ) / (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n"))
    b0 = F.col("sy") * 1.0 / F.col("n") - slope * (
        F.col("sx") * 1.0 / F.col("n")
    )
    fit = reg.select(slope.alias("slope"), b0.alias("b0"))
    prev = daily.select(
        (F.col("d") + 1).alias("d"), F.col("c").alias("y_prev")
    )
    steps = (
        daily.join(prev, "d")
        .crossJoin(F.broadcast(fit))
        .select(
            "d",
            F.col("c").alias("y"),
            "y_prev",
            (F.col("b0") + F.col("slope") * F.col("d")).alias("f"),
        )
    )
    s = steps.agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.sum(
            ((F.col("f") - F.col("y")) / F.col("y_prev"))
            * ((F.col("f") - F.col("y")) / F.col("y_prev"))
        ).alias("se_model"),
        F.sum(
            ((F.col("y") - F.col("y_prev")) * 1.0 / F.col("y_prev"))
            * ((F.col("y") - F.col("y_prev")) * 1.0 / F.col("y_prev"))
        ).alias("se_naive"),
    )
    u2 = F.sqrt(F.col("se_model") / F.col("se_naive"))
    return s.select(
        F.col("n_steps").cast("long"),
        F.round(F.sqrt(F.col("se_model") / F.col("n_steps")), 6).alias(
            "rrmse_model"
        ),
        F.round(F.sqrt(F.col("se_naive") / F.col("n_steps")), 6).alias(
            "rrmse_naive"
        ),
        F.round(u2, 6).alias("theils_u2"),
        (u2 < 1).alias("beats_naive"),
    )
