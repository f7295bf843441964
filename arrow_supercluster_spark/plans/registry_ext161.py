"""Round-6 registry additions, batch 156 — time-series structure:
spectral predictability, cointegration, and additive decomposition:

- q_spectral_entropy: normalized Shannon entropy of the daily-count
  periodogram — 1.0 = white noise (power spread over all
  frequencies), → 0 = a single dominant cycle. The one-scalar
  "is this series forecastable at all" screen on top of
  q_dft_power's spectrum (which lists the frequencies; this grades
  their concentration).
- q_engle_granger: Engle-Granger cointegration between the daily
  event-count and daily purchase-revenue series — OLS the long-run
  relation, then a Dickey-Fuller test on the residuals
  (Δe_t = γ·e_{{t−1}}, t-stat on γ vs the −3.37 two-variable 5%
  critical). "Do these two metrics share a common trend" asked
  properly — correlating trending series (q_early_value_corr) without
  this test is the classic spurious-regression trap.
- q_stl_lite: additive decomposition of the daily counts — trend =
  centered 7-day moving average, seasonal = day-of-week means of the
  detrended series (re-centered to sum to zero), remainder = the
  rest; per-day rows plus the variance split. The fixed-period
  companion to q_dft_power (which finds the period; this removes it).

At 100 TB: all three collapse the corpus to ≤31 day rows before any
math — the per-day aggregation partial-aggregates map-side.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql import Window

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_SE_K = 14  # periodogram frequencies 1..k (k <= n/2 for n = 30 days)
_EG_CRIT = -3.37  # Engle-Granger 2-variable 5% critical (asymptotic)

_SQL_DAILY = """
    daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    )
"""


# ===========================================================================
# R461 — spectral entropy
# ===========================================================================

@register(
    "q_spectral_entropy",
    f"""
    WITH {_SQL_DAILY},
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(c * 1.0) AS mu FROM daily
    ),
    freqs AS (SELECT UNNEST(range(1, {_SE_K} + 1)) AS k),
    spec AS (
      SELECT freqs.k,
             POWER(SUM((daily.c - stats.mu)
                       * cos(2 * pi() * freqs.k * daily.d / stats.n)), 2)
             + POWER(SUM((daily.c - stats.mu)
                         * sin(2 * pi() * freqs.k * daily.d / stats.n)), 2)
               AS p
      FROM daily CROSS JOIN stats CROSS JOIN freqs
      GROUP BY freqs.k
    ),
    tot AS (SELECT SUM(p) AS tp FROM spec),
    ent AS (
      SELECT -SUM(CASE WHEN spec.p > 0
                       THEN spec.p / tot.tp * ln(spec.p / tot.tp)
                       ELSE 0 END) AS h
      FROM spec CROSS JOIN tot
    )
    SELECT (SELECT n FROM stats) AS n_days,
           {_SE_K} AS n_freqs,
           round(ent.h, 6) AS spectral_entropy,
           round(ent.h / ln({_SE_K}.0), 6) AS normalized_entropy
    FROM ent
    """,
)
def q_spectral_entropy(spark, sf_dir):
    """R461 — spectral entropy of the mean-centered daily counts:
    periodogram P_k at k = 1..{k} (the q_dft_power frame), normalized
    to a distribution, H = −Σ p̂ ln p̂, reported raw and divided by
    ln {k} so 1.0 reads "white". Transcendentals compared after
    round(6) per the float-parity discipline; ≤31 rows × {k} literal
    frequencies.""".format(k=_SE_K)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.col("c") * 1.0).alias("mu")
    )
    freqs = spark.range(1, _SE_K + 1).select(F.col("id").alias("k"))
    ang = 2 * math.pi * F.col("k") * F.col("d") / F.col("n")
    spec = (
        daily.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(freqs))
        .groupBy("k")
        .agg(
            (
                F.pow(F.sum((F.col("c") - F.col("mu")) * F.cos(ang)), 2)
                + F.pow(F.sum((F.col("c") - F.col("mu")) * F.sin(ang)), 2)
            ).alias("p")
        )
    )
    tot = spec.agg(F.sum("p").alias("tp"))
    ent = spec.crossJoin(F.broadcast(tot)).agg(
        (
            -F.sum(
                F.when(
                    F.col("p") > 0,
                    F.col("p") / F.col("tp")
                    * F.log(F.col("p") / F.col("tp")),
                ).otherwise(0.0)
            )
        ).alias("h")
    )
    return ent.crossJoin(F.broadcast(stats)).select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(_SE_K).alias("n_freqs"),
        F.round("h", 6).alias("spectral_entropy"),
        F.round(F.col("h") / math.log(_SE_K), 6).alias(
            "normalized_entropy"
        ),
    )


# ===========================================================================
# R462 — Engle-Granger cointegration test
# ===========================================================================

@register(
    "q_engle_granger",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS x,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) / 100.0 AS y
      FROM events GROUP BY 1
    ),
    reg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x * 1.0) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * 1.0 * x) AS sxx
      FROM daily
    ),
    fit AS (
      SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS beta,
             sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
               * (sx / n) AS alpha
      FROM reg
    ),
    resid AS (
      SELECT daily.d, daily.y - (fit.alpha + fit.beta * daily.x) AS e
      FROM daily CROSS JOIN fit
    ),
    steps AS (
      SELECT cur.e - prev.e AS de, prev.e AS el
      FROM resid cur JOIN resid prev ON prev.d = cur.d - 1
    ),
    df AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(el * de) / SUM(el * el) AS gamma,
             SUM(el * el) AS see
      FROM steps
    ),
    tstat AS (
      SELECT df.m, df.gamma,
             df.gamma / sqrt(
               (SELECT SUM((de - df.gamma * el) * (de - df.gamma * el))
                FROM steps) / (df.m - 1) / df.see) AS t
      FROM df
    )
    SELECT (SELECT round(beta, 6) FROM fit) AS beta,
           m AS n_steps, round(gamma, 6) AS df_gamma,
           round(t, 4) AS df_tstat,
           t < {_EG_CRIT} AS cointegrated
    FROM tstat
    """,
)
def q_engle_granger(spark, sf_dir):
    """R462 — Engle-Granger: regress daily revenue on daily count
    (exact integer sums), Dickey-Fuller on the residuals — through-
    origin Δe = γe₋₁, t = γ̂/se(γ̂) vs the two-variable 5% critical
    {c} (stated constant). Cointegrated ⇔ the long-run relation's
    residuals mean-revert. Calendar-bounded adjacent-day join, no
    augmentation lags (DF, not ADF — stated).""".format(c=_EG_CRIT)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("x"),
        (
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ) / 100.0
        ).alias("y"),
    )
    reg = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x") * 1.0).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * 1.0 * F.col("x")).alias("sxx"),
    )
    beta = (
        F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    ) / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
    alpha = F.col("sy") / F.col("n") - beta * (F.col("sx") / F.col("n"))
    fit = reg.select(beta.alias("beta"), alpha.alias("alpha"))
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        (F.col("y") - (F.col("alpha") + F.col("beta") * F.col("x"))).alias(
            "e"
        ),
        "beta",
    )
    prev = resid.select(
        (F.col("d") + 1).alias("d"), F.col("e").alias("el")
    )
    steps = resid.join(prev, "d").select(
        (F.col("e") - F.col("el")).alias("de"), "el", "beta"
    )
    df = steps.agg(
        F.count(F.lit(1)).alias("m"),
        (
            F.sum(F.col("el") * F.col("de"))
            / F.sum(F.col("el") * F.col("el"))
        ).alias("gamma"),
        F.sum(F.col("el") * F.col("el")).alias("see"),
        F.max("beta").alias("beta"),
    )
    sse = (
        steps.crossJoin(
            F.broadcast(df.select("gamma"))
        )
        .agg(
            F.sum(
                (F.col("de") - F.col("gamma") * F.col("el"))
                * (F.col("de") - F.col("gamma") * F.col("el"))
            ).alias("sse")
        )
    )
    j = df.crossJoin(F.broadcast(sse))
    t = F.col("gamma") / F.sqrt(
        F.col("sse") / (F.col("m") - 1) / F.col("see")
    )
    return j.select(
        F.round("beta", 6).alias("beta"),
        F.col("m").cast("long").alias("n_steps"),
        F.round("gamma", 6).alias("df_gamma"),
        F.round(t, 4).alias("df_tstat"),
        (t < _EG_CRIT).alias("cointegrated"),
    )


# ===========================================================================
# R463 — STL-lite additive decomposition
# ===========================================================================

@register(
    "q_stl_lite",
    f"""
    WITH {_SQL_DAILY},
    trend AS (
      SELECT d, c,
             CASE WHEN d >= 4 AND d <= (SELECT MAX(d) FROM daily) - 3
               THEN (SELECT AVG(b.c * 1.0) FROM daily b
                     WHERE b.d BETWEEN daily.d - 3 AND daily.d + 3)
             END AS tr
      FROM daily
    ),
    detr AS (
      SELECT d, c, tr, c - tr AS dt, (d - 1) % 7 AS dow
      FROM trend WHERE tr IS NOT NULL
    ),
    smean AS (
      SELECT dow, AVG(dt) AS sm FROM detr GROUP BY dow
    ),
    scentered AS (
      SELECT dow, sm - (SELECT AVG(sm) FROM smean) AS s FROM smean
    )
    SELECT detr.d, CAST(detr.c AS BIGINT) AS observed,
           round(detr.tr, 4) AS trend,
           round(scentered.s, 4) AS seasonal,
           round(detr.dt - scentered.s, 4) AS remainder
    FROM detr JOIN scentered ON detr.dow = scentered.dow
    ORDER BY detr.d
    """,
)
def q_stl_lite(spark, sf_dir):
    """R463 — STL-lite over the daily counts: trend = centered 7-day
    moving average (defined only where the full window fits — days
    4..max−3, stated), seasonal = day-of-week means of the detrended
    series re-centered to sum to zero ((d−1) mod 7 — a pure-arithmetic
    weekday so both engines share it without locale), remainder = the
    rest. Per-day decomposition rows; the additive-model companion to
    q_seasonal_index's ratio form. ≤31-row frame, one 7-wide range
    self-join."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w7 = Window.orderBy("d").rangeBetween(-3, 3)
    mx = daily.agg(F.max("d").alias("mx"))
    trend = daily.crossJoin(F.broadcast(mx)).select(
        "d",
        "c",
        F.when(
            (F.col("d") >= 4) & (F.col("d") <= F.col("mx") - 3),
            F.avg(F.col("c") * 1.0).over(w7),
        ).alias("tr"),
    )
    detr = trend.filter(F.col("tr").isNotNull()).select(
        "d",
        "c",
        "tr",
        (F.col("c") - F.col("tr")).alias("dt"),
        ((F.col("d") - 1) % 7).alias("dow"),
    )
    smean = detr.groupBy("dow").agg(F.avg("dt").alias("sm"))
    grand = smean.agg(F.avg("sm").alias("g"))
    scentered = smean.crossJoin(F.broadcast(grand)).select(
        "dow", (F.col("sm") - F.col("g")).alias("s")
    )
    return (
        detr.join(F.broadcast(scentered), "dow")
        .select(
            "d",
            F.col("c").cast("long").alias("observed"),
            F.round("tr", 4).alias("trend"),
            F.round("s", 4).alias("seasonal"),
            F.round(F.col("dt") - F.col("s"), 4).alias("remainder"),
        )
        .orderBy("d")
    )
