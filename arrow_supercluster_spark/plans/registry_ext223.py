"""Round-8 registry additions, batch 218 — forecast-accuracy
completions on the daily-count backtest frame (q_forecast_backtest
ships MAE/MAPE for naive / seasonal-naive / EWMA; these are the three
readouts it lacks):

- q_forecast_accuracy: sMAPE, MASE (scaled by the in-sample one-step
  naive MAE — the scale-free denominator that makes methods comparable
  across series) and Theil's U (RMSE ratio vs naive) for naive and
  seasonal-naive one-step forecasts on eval days 8–30.
- q_tracking_signal: the forecast-monitoring readout — running
  Σ error / running mean |error| per eval day for the naive forecast,
  with the classic |TS| > 4 alarm flag.  Drifting bias trips it long
  before MAE moves.
- q_interval_coverage: empirical coverage of the naive forecast's
  80% prediction interval built from TRAILING residual quantiles
  (type-1 exact over days < t, no leakage) — the calibration check a
  forecast dashboard runs next to accuracy.

All three are offset self-joins over the ≤31-row day frame
(calendar-bounded windows, allowlisted).  At 100 TB: one daily
collapse, then literal-frame algebra.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_EVAL_FROM = 8  # eval days: full 7-day history exists (q_forecast_backtest)
_PI_LO, _PI_HI = 0.1, 0.9  # 80% interval

_SQL_DAILY = """
    daily AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT c, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
    )"""


def _spark_daily(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("day")  # calendar-bounded: ≤31 rows
    return daily.select("c", F.row_number().over(w).alias("rn"))


@register(
    "q_forecast_accuracy",
    f"""
    WITH {_SQL_DAILY},
    ev AS (
      SELECT a.rn, a.c AS y, n1.c AS f_naive, s7.c AS f_snaive
      FROM idx a
      JOIN idx n1 ON n1.rn = a.rn - 1
      JOIN idx s7 ON s7.rn = a.rn - 7
      WHERE a.rn >= {_EVAL_FROM}
    ),
    scale AS (
      -- in-sample one-step naive MAE over the PRE-eval days: the MASE
      -- denominator (Hyndman-Koehler)
      SELECT AVG(ABS(a.c - b.c) * 1.0) AS d
      FROM idx a JOIN idx b ON b.rn = a.rn - 1
      WHERE a.rn < {_EVAL_FROM}
    ),
    m AS (
      SELECT method, AVG(ABS(y - f) * 1.0) AS mae,
             AVG(2.0 * ABS(y - f) / (ABS(y * 1.0) + ABS(f * 1.0)))
               AS smape,
             sqrt(AVG((y - f) * 1.0 * (y - f))) AS rmse
      FROM (
        SELECT rn, y, f_naive AS f, 'naive' AS method FROM ev
        UNION ALL
        SELECT rn, y, f_snaive, 'seasonal_naive' FROM ev
      ) GROUP BY method
    ),
    base AS (SELECT rmse AS rmse_naive FROM m WHERE method = 'naive')
    SELECT m.method, round(m.mae, 6) AS mae,
           round(m.smape, 6) AS smape,
           round(m.mae / scale.d, 6) AS mase,
           round(m.rmse / base.rmse_naive, 6) AS theil_u
    FROM m CROSS JOIN scale CROSS JOIN base
    ORDER BY m.method
    """,
)
def q_forecast_accuracy(spark, sf_dir):
    """R647 — sMAPE / MASE / Theil's U for naive and seasonal-naive
    one-step forecasts on eval days ≥ {d}: sMAPE = mean 2|y−f|/(|y|+|f|),
    MASE = MAE / in-sample pre-eval naive MAE (the Hyndman-Koehler
    scale — <1 beats naive where naive was measured), Theil's U =
    RMSE/RMSE_naive.  Completes q_forecast_backtest's MAE/MAPE pair
    with the scale-free trio.  Two offset joins on ≤31 rows.""".format(
        d=_EVAL_FROM
    )
    idx = _spark_daily(spark, sf_dir)
    a, n1, s7 = idx.alias("a"), idx.alias("n1"), idx.alias("s7")
    ev = (
        a.join(n1, F.col("n1.rn") == F.col("a.rn") - 1)
        .join(s7, F.col("s7.rn") == F.col("a.rn") - 7)
        .filter(F.col("a.rn") >= _EVAL_FROM)
        .select(
            F.col("a.rn").alias("rn"),
            F.col("a.c").alias("y"),
            F.col("n1.c").alias("f_naive"),
            F.col("s7.c").alias("f_snaive"),
        )
    )
    b = idx.alias("b")
    scale = (
        a.join(b, F.col("b.rn") == F.col("a.rn") - 1)
        .filter(F.col("a.rn") < _EVAL_FROM)
        .agg(F.avg(F.abs(F.col("a.c") - F.col("b.c")) * 1.0).alias("d"))
    )
    stacked = ev.select(
        "rn", "y", F.col("f_naive").alias("f"), F.lit("naive").alias("method")
    ).unionByName(
        ev.select(
            "rn", "y", F.col("f_snaive").alias("f"),
            F.lit("seasonal_naive").alias("method"),
        )
    )
    m = stacked.groupBy("method").agg(
        F.avg(F.abs(F.col("y") - F.col("f")) * 1.0).alias("mae"),
        F.avg(
            2.0
            * F.abs(F.col("y") - F.col("f"))
            / (F.abs(F.col("y") * 1.0) + F.abs(F.col("f") * 1.0))
        ).alias("smape"),
        F.sqrt(
            F.avg((F.col("y") - F.col("f")) * 1.0 * (F.col("y") - F.col("f")))
        ).alias("rmse"),
    )
    base = m.filter(F.col("method") == "naive").select(
        F.col("rmse").alias("rmse_naive")
    )
    return (
        m.crossJoin(F.broadcast(scale))
        .crossJoin(F.broadcast(base))
        .select(
            "method",
            F.round("mae", 6).alias("mae"),
            F.round("smape", 6).alias("smape"),
            F.round(F.col("mae") / F.col("d"), 6).alias("mase"),
            F.round(F.col("rmse") / F.col("rmse_naive"), 6).alias(
                "theil_u"
            ),
        )
        .orderBy("method")
    )


@register(
    "q_tracking_signal",
    f"""
    WITH {_SQL_DAILY},
    ev AS (
      SELECT a.rn, a.c - n1.c AS e
      FROM idx a JOIN idx n1 ON n1.rn = a.rn - 1
      WHERE a.rn >= {_EVAL_FROM}
    ),
    run AS (
      SELECT rn, e,
             SUM(e * 1.0) OVER (ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume,
             AVG(ABS(e) * 1.0) OVER (ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mad
      FROM ev
    )
    SELECT rn AS day_idx, CAST(e AS BIGINT) AS error,
           round(cume, 4) AS cum_error,
           round(mad, 4) AS mad,
           round(CASE WHEN mad > 0 THEN cume / mad END, 4)
             AS tracking_signal,
           (mad > 0 AND ABS(cume / mad) > 4.0) AS alarm
    FROM run ORDER BY rn
    """,
)
def q_tracking_signal(spark, sf_dir):
    """R648 — the Brown tracking signal for the naive one-step
    forecast: TS_t = Σe / mean|e| over eval days so far; |TS| > 4 is
    the classic bias alarm (a consistently-signed error stream trips
    it long before MAE moves).  One offset join + running windows over
    the ≤31-row frame.""".format()
    idx = _spark_daily(spark, sf_dir)
    a, n1 = idx.alias("a"), idx.alias("n1")
    ev = (
        a.join(n1, F.col("n1.rn") == F.col("a.rn") - 1)
        .filter(F.col("a.rn") >= _EVAL_FROM)
        .select(
            F.col("a.rn").alias("rn"),
            (F.col("a.c") - F.col("n1.c")).alias("e"),
        )
    )
    w = (
        Window.orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = ev.select(
        "rn", "e",
        F.sum(F.col("e") * 1.0).over(w).alias("cume"),
        F.avg(F.abs(F.col("e")) * 1.0).over(w).alias("mad"),
    )
    ts = F.when(F.col("mad") > 0, F.col("cume") / F.col("mad"))
    return run.select(
        F.col("rn").alias("day_idx"),
        F.col("e").cast("long").alias("error"),
        F.round("cume", 4).alias("cum_error"),
        F.round("mad", 4).alias("mad"),
        F.round(ts, 4).alias("tracking_signal"),
        ((F.col("mad") > 0) & (F.abs(F.col("cume") / F.col("mad")) > 4.0))
        .alias("alarm"),
    ).orderBy("day_idx")


@register(
    "q_interval_coverage",
    f"""
    WITH {_SQL_DAILY},
    resid AS (
      -- trailing one-step naive residuals: e_t for every t ≥ 2
      SELECT a.rn, a.c - n1.c AS e
      FROM idx a JOIN idx n1 ON n1.rn = a.rn - 1
    ),
    ev AS (
      SELECT a.rn, a.c AS y, n1.c AS f
      FROM idx a JOIN idx n1 ON n1.rn = a.rn - 1
      WHERE a.rn >= {_EVAL_FROM}
    ),
    -- per eval day: type-1 (inverse-ECDF) quantiles of the residuals
    -- STRICTLY BEFORE it (no leakage)
    bounds AS (
      SELECT ev.rn, ev.y, ev.f,
             (SELECT MIN(e) FROM (
                SELECT r.e,
                       ROW_NUMBER() OVER (ORDER BY r.e) AS k,
                       COUNT(*) OVER () AS m
                FROM resid r WHERE r.rn < ev.rn)
              WHERE k >= ceil(m * {_PI_LO})) AS q_lo,
             (SELECT MIN(e) FROM (
                SELECT r.e,
                       ROW_NUMBER() OVER (ORDER BY r.e) AS k,
                       COUNT(*) OVER () AS m
                FROM resid r WHERE r.rn < ev.rn)
              WHERE k >= ceil(m * {_PI_HI})) AS q_hi
      FROM ev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_days,
           round(AVG(CASE WHEN y >= f + q_lo AND y <= f + q_hi
                     THEN 1.0 ELSE 0.0 END), 6) AS coverage,
           round(AVG((q_hi - q_lo) * 1.0), 4) AS mean_width,
           {_PI_HI} - {_PI_LO} AS nominal
    FROM bounds
    """,
)
def q_interval_coverage(spark, sf_dir):
    """R649 — empirical coverage of the naive forecast's 80% interval:
    per eval day, the interval is f + [Q_{{0.1}}, Q_{{0.9}}] of the
    TRAILING one-step residuals (type-1 inverse-ECDF quantile, strictly
    earlier days — no leakage); coverage = fraction of eval days whose
    actual lands inside, with the mean width and the nominal level for
    the calibration read.  Residual frames are ≤31 rows per day."""
    idx = _spark_daily(spark, sf_dir)
    a, n1 = idx.alias("a"), idx.alias("n1")
    resid = a.join(n1, F.col("n1.rn") == F.col("a.rn") - 1).select(
        F.col("a.rn").alias("rn"),
        (F.col("a.c") - F.col("n1.c")).alias("e"),
    )
    ev = (
        a.join(n1, F.col("n1.rn") == F.col("a.rn") - 1)
        .filter(F.col("a.rn") >= _EVAL_FROM)
        .select(
            F.col("a.rn").alias("ern"),
            F.col("a.c").alias("y"),
            F.col("n1.c").alias("f"),
        )
    )
    # trailing quantiles: pair every eval day with all earlier
    # residuals, rank within the (eval day) partition — keyed windows
    paired = ev.join(resid, resid["rn"] < ev["ern"]).select(
        "ern", "y", "f", "e"
    )
    wk = Window.partitionBy("ern").orderBy("e")
    ranked = paired.select(
        "ern", "y", "f", "e",
        F.row_number().over(wk).alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy("ern")).alias("m"),
    )
    qs = ranked.groupBy("ern", "y", "f").agg(
        F.min(
            F.when(
                F.col("k") >= F.ceil(F.col("m") * _PI_LO), F.col("e")
            )
        ).alias("q_lo"),
        F.min(
            F.when(
                F.col("k") >= F.ceil(F.col("m") * _PI_HI), F.col("e")
            )
        ).alias("q_hi"),
    )
    return qs.agg(
        F.count(F.lit(1)).alias("n_eval_days"),
        F.round(
            F.avg(
                F.when(
                    (F.col("y") >= F.col("f") + F.col("q_lo"))
                    & (F.col("y") <= F.col("f") + F.col("q_hi")),
                    1.0,
                ).otherwise(0.0)
            ),
            6,
        ).alias("coverage"),
        F.round(
            F.avg((F.col("q_hi") - F.col("q_lo")) * 1.0), 4
        ).alias("mean_width"),
        F.lit(_PI_HI - _PI_LO).alias("nominal"),
    )
