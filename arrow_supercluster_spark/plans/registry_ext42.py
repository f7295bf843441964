"""Round-2 registry additions, batch 37 — smoothing, digit-law
profiling, and randomness testing on the daily series:

- q_ema_daily: exponential moving average of daily counts via the
  closed-form scan (no sequential recurrence);
- q_benford: first-significant-digit distribution of event values vs
  Benford's law with the chi-square distance;
- q_runs_test: Wald-Wolfowitz runs test on above/below-median daily
  counts — serial-randomness check (q_autocorrelation's hypothesis-test
  sibling).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# EMA
# ===========================================================================

_EMA_ALPHA = 0.3


@register(
    "q_ema_daily",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT d, n, ROW_NUMBER() OVER (ORDER BY d) - 1 AS t FROM daily
    ),
    s AS (
      SELECT d, n, t,
             SUM(n * power(1.0 - {_EMA_ALPHA}, -t)) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS scan
      FROM idx
    )
    SELECT epoch_us(d) AS day_us, n,
           round({_EMA_ALPHA} * power(1.0 - {_EMA_ALPHA}, t) * scan, 6) AS ema
    FROM s
    """,
)
def q_ema_daily(spark, sf_dir):
    """Time series — exponential moving average of the daily count,
    α={a}: the sequential recurrence emaₜ = α·xₜ + (1−α)·emaₜ₋₁
    (unadjusted, zero-init) restated as a CLOSED-FORM scan —
    emaₜ = α·(1−α)ᵗ · Σᵢ≤ₜ xᵢ(1−α)⁻ⁱ — so one running-sum window over
    the |days| table replaces the row-at-a-time loop. The (1−α)⁻ⁱ
    factor grows exponentially: fine for calendar-bounded series
    (10³ days ≈ 10¹⁵⁵ < double max); a multi-year stream would chunk
    the scan per ~500-day segment with a carried seed. Identical
    association order both engines (same window order) → round(6)
    covers the power() libm residue.""".format(a=_EMA_ALPHA)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    idx = daily.select(
        "d", "n", (F.row_number().over(Window.orderBy("d")) - 1).alias("t")
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    scan = F.sum(
        F.col("n") * F.pow(F.lit(1.0 - _EMA_ALPHA), -F.col("t"))
    ).over(w)
    return idx.select(
        F.unix_micros("d").alias("day_us"),
        "n",
        F.round(
            F.lit(_EMA_ALPHA) * F.pow(F.lit(1.0 - _EMA_ALPHA), F.col("t")) * scan,
            6,
        ).alias("ema"),
    )


# ===========================================================================
# Benford profile
# ===========================================================================

@register(
    "q_benford",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(value AS DECIMAL(18, 6)) AS VARCHAR), 1, 1)
                  AS INTEGER) AS d
      FROM events WHERE value IS NOT NULL AND value >= 1
    ),
    counts AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT SUM(n) AS total FROM counts)
    SELECT d, n,
           round(n * 1.0 / total, 6) AS observed,
           round(log10(1.0 + 1.0 / d), 6) AS benford,
           round((n * 1.0 / total - log10(1.0 + 1.0 / d))
                 * (n * 1.0 / total - log10(1.0 + 1.0 / d))
                 / log10(1.0 + 1.0 / d), 9) AS chi_term
    FROM counts CROSS JOIN tot
    """,
)
def q_benford(spark, sf_dir):
    """Profiling — Benford first-digit law: observed leading-digit
    shares of event values (≥1, fixed-point rendering so both engines
    take the same first digit) against log₁₀(1+1/d), with per-digit
    chi-square terms — the fabricated-data / unit-mix smoke alarm. One
    narrow digit projection + a 9-key agg; shares round to 6."""
    ev = read_events(spark, sf_dir).filter(
        F.col("value").isNotNull() & (F.col("value") >= 1)
    )
    d = F.substring(
        F.col("value").cast("decimal(18,6)").cast("string"), 1, 1
    ).cast("int")
    counts = ev.select(d.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("total"))
    obs = F.col("n") * 1.0 / F.col("total")
    ben = F.log10(1.0 + 1.0 / F.col("d"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "d", "n",
        F.round(obs, 6).alias("observed"),
        F.round(ben, 6).alias("benford"),
        F.round((obs - ben) * (obs - ben) / ben, 9).alias("chi_term"),
    )


# ===========================================================================
# Runs test
# ===========================================================================

@register(
    "q_runs_test",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    med AS (SELECT quantile_cont(n, 0.5) AS m FROM daily),
    signed AS (
      SELECT d, CASE WHEN n > m THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med WHERE n <> m
    ),
    runs AS (
      SELECT s,
             CASE WHEN lag(s) OVER (ORDER BY d) IS NULL
                    OR lag(s) OVER (ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signed
    ),
    agg AS (
      SELECT SUM(new_run) AS r,
             SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS n0
      FROM runs
    )
    SELECT r, n0, n1,
           round(2.0 * n0 * n1 / (n0 + n1) + 1.0, 6) AS expected_r,
           round((r - (2.0 * n0 * n1 / (n0 + n1) + 1.0))
                 / sqrt(2.0 * n0 * n1 * (2.0 * n0 * n1 - n0 - n1)
                        / ((n0 + n1) * (n0 + n1) * (n0 + n1 - 1.0))), 6) AS z
    FROM agg
    """,
)
def q_runs_test(spark, sf_dir):
    """Time series — Wald-Wolfowitz runs test: is the sequence of
    above/below-median daily counts serially random? Runs are counted
    with one lag window on the |days| table (median-equal days drop, the
    standard treatment); the z-score compares observed runs to
    2n₀n₁/(n₀+n₁)+1. Too few runs ⇒ positive serial dependence (regime
    persistence — cf. q_cusum_changepoint), too many ⇒ oscillation."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    med = daily.agg(F.expr("percentile(n, 0.5)").alias("m"))
    signed = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("n") != F.col("m"))
        .select("d", F.when(F.col("n") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    lag_s = F.lag("s").over(Window.orderBy("d"))
    runs = signed.select(
        "s",
        F.when(lag_s.isNull() | (lag_s != F.col("s")), 1).otherwise(0).alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("n0"),
    )
    exp_r = 2.0 * F.col("n0") * F.col("n1") / (F.col("n0") + F.col("n1")) + 1.0
    var_r = (
        2.0 * F.col("n0") * F.col("n1")
        * (2.0 * F.col("n0") * F.col("n1") - F.col("n0") - F.col("n1"))
        / (
            (F.col("n0") + F.col("n1"))
            * (F.col("n0") + F.col("n1"))
            * (F.col("n0") + F.col("n1") - 1.0)
        )
    )
    return agg.select(
        "r", "n0", "n1",
        F.round(exp_r, 6).alias("expected_r"),
        F.round((F.col("r") - exp_r) / F.sqrt(var_r), 6).alias("z"),
    )
