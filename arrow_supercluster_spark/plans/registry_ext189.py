"""Round-7 registry additions, batch 184 — time-series diagnostics
completions (peaks, volatility clustering, dominant frequency):

- q_peak_detection: local maxima of the per-type daily count series —
  a day strictly above both neighbors AND >= every day within a
  radius-3 dominance window, with height-above-local-baseline
  (window median via exact quantile) shipped per peak.  The alerting
  primitive behind "did traffic spike"; windows are bounded
  self-joins on the <=31-row day-rank frame, no sequential scan.
- q_arch_effect: Engle's ARCH(1) LM test per event type — regress
  today's squared mean-residual on yesterday's, LM = n·R² against the
  chi²(1) 5% constant.  Volatility clustering is THE signature of
  bursty traffic; closed form from five lag-joined sums.
- q_spectral_peak: dominant frequency of the daily series by direct
  DFT at the bounded integer frequencies k = 1..10 — power_k =
  (Σ n_t cos(2πkt/T))² + (Σ n_t sin(2πkt/T))² over the mean-centered
  series, argmax with lowest-k tiebreak and power share.  Detects
  weekly seasonality (k ≈ T/7) without an FFT library; two trig
  projections + a 10-key rollup per type.

At 100 TB: all three collapse the corpus once to <=31 day rows per
type; everything after is day-frame-sized joins and 10-key
aggregates.  Trig/ln arguments are ratios of exact integers, so both
engines evaluate identical inputs; outputs round to 6.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_PK_RADIUS = 3
_ARCH_CRIT = 3.841  # chi2(1) at 5% — stated constant
_SP_MAX_K = 10

_SQL_DAILY = """
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
"""


# ===========================================================================
# R550 — local peak detection with dominance radius
# ===========================================================================

@register(
    "q_peak_detection",
    f"""
    WITH daily AS ({_SQL_DAILY}),
    idx AS (
      SELECT event_type, day, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY day) AS rk
      FROM daily
    ),
    hood AS (
      SELECT a.event_type, a.day, a.n, a.rk,
             MAX(CASE WHEN b.rk <> a.rk THEN b.n END) AS hood_max,
             MAX(CASE WHEN b.rk = a.rk - 1 THEN b.n END) AS prev_n,
             MAX(CASE WHEN b.rk = a.rk + 1 THEN b.n END) AS next_n,
             quantile_cont(b.n, 0.5) AS hood_median
      FROM idx a JOIN idx b
        ON b.event_type = a.event_type
       AND abs(b.rk - a.rk) <= {_PK_RADIUS}
      GROUP BY 1, 2, 3, 4
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           round(n - hood_median, 4) AS height_above_median
    FROM hood
    WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
      AND n > prev_n AND n > next_n AND n >= hood_max
    ORDER BY event_type, day
    """,
)
def q_peak_detection(spark, sf_dir):
    """R550 — local peaks: strictly above both neighbors, >= the whole
    ±3-day dominance window (boundary days excluded — no one-sided
    peaks), with height above the window median (exact interpolated
    quantile, `percentile` ≡ `quantile_cont`).  One corpus collapse to
    day rows; the neighborhood is a bounded band self-join."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type", "day", "n", F.row_number().over(w).alias("rk")
    )
    b = idx.select(
        F.col("event_type").alias("bt"),
        F.col("n").alias("bn"),
        F.col("rk").alias("brk"),
    )
    hood = (
        idx.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.abs(F.col("brk") - F.col("rk")) <= _PK_RADIUS),
        )
        .groupBy("event_type", "day", "n", "rk")
        .agg(
            F.max(
                F.when(F.col("brk") != F.col("rk"), F.col("bn"))
            ).alias("hood_max"),
            F.max(
                F.when(F.col("brk") == F.col("rk") - 1, F.col("bn"))
            ).alias("prev_n"),
            F.max(
                F.when(F.col("brk") == F.col("rk") + 1, F.col("bn"))
            ).alias("next_n"),
            F.expr("percentile(bn, 0.5)").alias("hood_median"),
        )
    )
    return (
        hood.filter(
            F.col("prev_n").isNotNull()
            & F.col("next_n").isNotNull()
            & (F.col("n") > F.col("prev_n"))
            & (F.col("n") > F.col("next_n"))
            & (F.col("n") >= F.col("hood_max"))
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(F.col("n") - F.col("hood_median"), 4).alias(
                "height_above_median"
            ),
        )
        .orderBy("event_type", "day")
    )


# ===========================================================================
# R551 — ARCH(1) LM test (volatility clustering)
# ===========================================================================

@register(
    "q_arch_effect",
    f"""
    WITH daily AS ({_SQL_DAILY}),
    mu AS (SELECT event_type, AVG(n * 1.0) AS m FROM daily GROUP BY 1),
    sq AS (
      SELECT d.event_type, d.day,
             (d.n - mu.m) * (d.n - mu.m) AS e2,
             row_number() OVER (PARTITION BY d.event_type
                                ORDER BY d.day) AS rk
      FROM daily d JOIN mu ON mu.event_type = d.event_type
    ),
    lagged AS (
      SELECT a.event_type, a.e2 AS y, b.e2 AS x
      FROM sq a JOIN sq b
        ON b.event_type = a.event_type AND b.rk = a.rk - 1
    ),
    fit AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
             / NULLIF(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x), 0)
               AS slope,
             CASE WHEN (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                       * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y)) = 0
                  THEN 0.0
                  ELSE POWER(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y), 2)
                       / ((COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                          * (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y)))
             END AS r2
      FROM lagged GROUP BY 1
    )
    SELECT event_type, n, round(slope, 6) AS arch_slope,
           round(r2, 6) AS r2, round(n * r2, 6) AS lm_stat,
           n * r2 > {_ARCH_CRIT} AS volatility_clustered
    FROM fit ORDER BY event_type
    """,
)
def q_arch_effect(spark, sf_dir):
    """R551 — Engle's ARCH(1) LM test per event type: squared mean-
    residuals regressed on their lag-1, LM = n·R² vs chi²(1) at 5%.
    Five sums over the lag-joined day frame; the lag attaches by a
    rank self-join (no unbounded window)."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    mu = daily.groupBy("event_type").agg(
        F.avg(F.col("n") * 1.0).alias("m")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    sq = (
        daily.join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            ((F.col("n") - F.col("m")) * (F.col("n") - F.col("m")))
            .alias("e2"),
            F.row_number().over(w).alias("rk"),
        )
    )
    b = sq.select(
        F.col("event_type").alias("bt"),
        F.col("e2").alias("x"),
        F.col("rk").alias("brk"),
    )
    lagged = sq.join(
        b,
        (F.col("bt") == F.col("event_type"))
        & (F.col("brk") == F.col("rk") - 1),
    ).select("event_type", F.col("e2").alias("y"), "x")
    n = F.count(F.lit(1))
    sxy = n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")
    sxx = n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    syy = n * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y")
    r2 = F.when(sxx * syy == 0, F.lit(0.0)).otherwise(
        F.pow(sxy, 2) / (sxx * syy)
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            n.alias("n"),
            F.round(sxy / F.nullif(sxx, F.lit(0)), 6).alias(
                "arch_slope"
            ),
            F.round(r2, 6).alias("r2"),
            F.round(n * r2, 6).alias("lm_stat"),
            (n * r2 > _ARCH_CRIT).alias("volatility_clustered"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R552 — dominant frequency by bounded DFT
# ===========================================================================

@register(
    "q_spectral_peak",
    f"""
    WITH daily AS ({_SQL_DAILY}),
    mu AS (SELECT event_type, AVG(n * 1.0) AS m,
                  CAST(COUNT(*) AS BIGINT) AS t
           FROM daily GROUP BY 1),
    idx AS (
      SELECT d.event_type, d.n - mu.m AS e, mu.t,
             row_number() OVER (PARTITION BY d.event_type
                                ORDER BY d.day) - 1 AS tt
      FROM daily d JOIN mu ON mu.event_type = d.event_type
    ),
    power AS (
      SELECT i.event_type, k.k, ANY_VALUE(i.t) AS t,
             POWER(SUM(i.e * cos(2 * pi() * k.k * i.tt / i.t)), 2)
             + POWER(SUM(i.e * sin(2 * pi() * k.k * i.tt / i.t)), 2)
               AS p
      FROM idx i
      CROSS JOIN (SELECT unnest(generate_series(1, {_SP_MAX_K})) AS k) k
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, SUM(p) AS tp FROM power GROUP BY 1
    ),
    best AS (
      SELECT p.event_type, p.k, p.p, p.t, tot.tp,
             row_number() OVER (PARTITION BY p.event_type
                                ORDER BY round(p.p, 9) DESC, p.k) AS rn
      FROM power p JOIN tot ON tot.event_type = p.event_type
    )
    SELECT event_type, CAST(k AS BIGINT) AS dominant_k,
           round(t * 1.0 / k, 4) AS period_days,
           round(p, 4) AS power,
           round(p / tp, 6) AS power_share
    FROM best WHERE rn = 1 ORDER BY event_type
    """,
)
def q_spectral_peak(spark, sf_dir):
    """R552 — dominant frequency by direct DFT at k = 1..10 over the
    mean-centered daily series: power_k = (Σe·cos)² + (Σe·sin)²,
    argmax on round-9 power with lowest-k tiebreak, period = T/k and
    power share shipped.  Detects weekly cadence (period ≈ 7) without
    an FFT dependency; the corpus collapses once, then 10 trig
    projections + one rollup per type."""
    import math

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    mu = daily.groupBy("event_type").agg(
        F.avg(F.col("n") * 1.0).alias("m"),
        F.count(F.lit(1)).alias("t"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    idx = (
        daily.join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            (F.col("n") - F.col("m")).alias("e"),
            "t",
            (F.row_number().over(w) - 1).alias("tt"),
        )
    )
    ks = spark.range(1, _SP_MAX_K + 1).select(F.col("id").alias("k"))
    ang = 2 * math.pi * F.col("k") * F.col("tt") / F.col("t")
    power = (
        idx.crossJoin(F.broadcast(ks))
        .groupBy("event_type", "k")
        .agg(
            F.first("t").alias("t"),
            (
                F.pow(F.sum(F.col("e") * F.cos(ang)), 2)
                + F.pow(F.sum(F.col("e") * F.sin(ang)), 2)
            ).alias("p"),
        )
    )
    tot = power.groupBy(F.col("event_type").alias("te")).agg(
        F.sum("p").alias("tp")
    )
    wb = Window.partitionBy("event_type").orderBy(
        F.round(F.col("p"), 9).desc(), "k"
    )
    return (
        power.join(
            F.broadcast(tot), F.col("te") == F.col("event_type")
        )
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("k").alias("dominant_k"),
            F.round(F.col("t") * 1.0 / F.col("k"), 4).alias(
                "period_days"
            ),
            F.round(F.col("p"), 4).alias("power"),
            F.round(F.col("p") / F.col("tp"), 6).alias("power_share"),
        )
        .orderBy("event_type")
    )
