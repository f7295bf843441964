"""Round-6 registry additions, batch 162 — extreme values and
statistical process control over the event stream:

- q_gumbel_maxima: Gumbel fit to the daily maxima of hourly event
  counts (block maxima → the Type-I extreme-value domain) by the
  method of moments (β = s√6/π, μ = x̄ − γβ), with the 30-day and
  365-day return levels. The capacity question "what hourly spike
  should we engineer for" answered from extremes, not means —
  q_zscore_outliers' Gaussian tails are exactly wrong for maxima.
- q_xbar_s_chart: X̄/s control chart with day subgroups of the 24
  hourly counts — grand center lines, A3/B3/B4 limits for n=24
  (exact c4 from the Γ formula, stated constants), per-day
  out-of-control flags for both the mean and the dispersion panel.
- q_ewma_chart: EWMA control chart over daily counts — z_t from the
  closed power-weighted form (a bounded day×day triangular join, no
  window at all), time-varying limits ±L·σ̂·√(λ/(2−λ)·(1−(1−λ)^{2t})).
  Catches small sustained shifts the X̄ chart's 3σ points miss.

At 100 TB: all three collapse to (day, hour) / day frames first —
≤720 / ≤31 rows; the EWMA triangular join is ≤31² cells.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_EULER_GAMMA = 0.5772156649015329
_XS_N = 24  # subgroup size: hours per day
_XS_C4 = 0.989193  # c4 for n=24 (Gamma formula, 6dp)
_XS_A3 = 0.619063
_XS_B3 = 0.55533
_XS_B4 = 1.44467
_EW_LAMBDA = 0.2
_EW_L = 3.0

_SQL_HOURLY = """
    hourly AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(strftime(ts, '%H') AS INTEGER) AS h,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    )
"""


# ===========================================================================
# R479 — Gumbel fit to block maxima
# ===========================================================================

@register(
    "q_gumbel_maxima",
    f"""
    WITH {_SQL_HOURLY},
    maxima AS (
      SELECT d, MAX(c) AS mx FROM hourly GROUP BY d
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(mx * 1.0) AS m,
             sqrt(SUM((mx - (SELECT AVG(mx * 1.0) FROM maxima))
                      * (mx - (SELECT AVG(mx * 1.0) FROM maxima)))
                  / (COUNT(*) - 1)) AS s
      FROM maxima
    ),
    fit AS (
      SELECT n, m, s,
             s * sqrt(6.0) / pi() AS beta,
             m - {_EULER_GAMMA} * s * sqrt(6.0) / pi() AS mu
      FROM mom
    )
    SELECT n AS n_blocks,
           round(mu, 4) AS gumbel_mu,
           round(beta, 4) AS gumbel_beta,
           round(mu - beta * ln(-ln(1 - 1.0 / 30)), 4)
             AS return_level_30,
           round(mu - beta * ln(-ln(1 - 1.0 / 365)), 4)
             AS return_level_365
    FROM fit
    """,
)
def q_gumbel_maxima(spark, sf_dir):
    """R479 — Gumbel over daily maxima of hourly counts: moments fit
    β = s√6/π, μ = x̄ − γβ (γ = Euler-Mascheroni, stated), return
    level x_T = μ − β·ln(−ln(1−1/T)) at T = 30 and 365 blocks. The
    extreme-value companion to q_weibull_fit (minima/lifetimes) and
    q_hill_tail_index (tail exponent); block maxima collapse the
    corpus to ≤31 rows before any math."""
    ev = read_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.dayofmonth("ts").alias("d"), F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    maxima = hourly.groupBy("d").agg(F.max("c").alias("mx"))
    mu_f = maxima.agg(F.avg(F.col("mx") * 1.0).alias("m0"))
    mom = maxima.crossJoin(F.broadcast(mu_f)).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("m0").alias("m"),
        F.sqrt(
            F.sum((F.col("mx") - F.col("m0")) * (F.col("mx") - F.col("m0")))
            / (F.count(F.lit(1)) - 1)
        ).alias("s"),
    )
    beta = F.col("s") * math.sqrt(6.0) / math.pi
    mu = F.col("m") - _EULER_GAMMA * beta
    fit = mom.select(
        "n", beta.alias("beta"), mu.alias("mu")
    )
    rl = lambda T: F.col("mu") - F.col("beta") * math.log(  # noqa: E731
        -math.log(1 - 1.0 / T)
    )
    return fit.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.round("mu", 4).alias("gumbel_mu"),
        F.round("beta", 4).alias("gumbel_beta"),
        F.round(rl(30), 4).alias("return_level_30"),
        F.round(rl(365), 4).alias("return_level_365"),
    )


# ===========================================================================
# R480 — X-bar / s control chart
# ===========================================================================

@register(
    "q_xbar_s_chart",
    f"""
    WITH {_SQL_HOURLY},
    sub AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n, AVG(c * 1.0) AS xbar,
             sqrt(SUM((c - (SELECT AVG(b.c * 1.0) FROM hourly b
                            WHERE b.d = hourly.d))
                      * (c - (SELECT AVG(b.c * 1.0) FROM hourly b
                              WHERE b.d = hourly.d)))
                  / (COUNT(*) - 1)) AS s
      FROM hourly GROUP BY d
    ),
    grand AS (
      SELECT AVG(xbar) AS xbb, AVG(s) AS sbar FROM sub
      WHERE n = {_XS_N}
    )
    SELECT sub.d, CAST(sub.n AS BIGINT) AS n_hours,
           round(sub.xbar, 4) AS xbar, round(sub.s, 4) AS s,
           round(grand.xbb, 4) AS center_x,
           round(grand.xbb + {_XS_A3} * grand.sbar, 4) AS ucl_x,
           round(grand.xbb - {_XS_A3} * grand.sbar, 4) AS lcl_x,
           round({_XS_B4} * grand.sbar, 4) AS ucl_s,
           round({_XS_B3} * grand.sbar, 4) AS lcl_s,
           sub.xbar > grand.xbb + {_XS_A3} * grand.sbar
             OR sub.xbar < grand.xbb - {_XS_A3} * grand.sbar
             AS mean_out,
           sub.s > {_XS_B4} * grand.sbar
             OR sub.s < {_XS_B3} * grand.sbar AS spread_out
    FROM sub CROSS JOIN grand
    WHERE sub.n = {_XS_N}
    ORDER BY sub.d
    """,
)
def q_xbar_s_chart(spark, sf_dir):
    """R480 — X̄/s chart with day subgroups of the {n} hourly counts
    (days missing an hour are excluded from both the grand averages
    and the chart — stated): centers X̄̄ and s̄, limits X̄̄ ± A3·s̄ and
    [B3·s̄, B4·s̄] with the n={n} constants c4={c4}, A3={a3},
    B3={b3}, B4={b4} (exact Γ-formula values, 6dp literals so both
    engines agree bit-for-bit). Per-day rows flag the mean and
    dispersion panels separately.""".format(
        n=_XS_N, c4=_XS_C4, a3=_XS_A3, b3=_XS_B3, b4=_XS_B4
    )
    ev = read_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.dayofmonth("ts").alias("d"), F.hour("ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    day_mu = hourly.groupBy("d").agg(F.avg(F.col("c") * 1.0).alias("dm"))
    sub = (
        hourly.join(F.broadcast(day_mu), "d")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("c") * 1.0).alias("xbar"),
            F.sqrt(
                F.sum(
                    (F.col("c") - F.col("dm")) * (F.col("c") - F.col("dm"))
                )
                / (F.count(F.lit(1)) - 1)
            ).alias("s"),
        )
        .filter(F.col("n") == _XS_N)
    )
    grand = sub.agg(
        F.avg("xbar").alias("xbb"), F.avg("s").alias("sbar")
    )
    j = sub.crossJoin(F.broadcast(grand))
    ucl_x = F.col("xbb") + _XS_A3 * F.col("sbar")
    lcl_x = F.col("xbb") - _XS_A3 * F.col("sbar")
    return j.select(
        "d",
        F.col("n").cast("long").alias("n_hours"),
        F.round("xbar", 4).alias("xbar"),
        F.round("s", 4).alias("s"),
        F.round("xbb", 4).alias("center_x"),
        F.round(ucl_x, 4).alias("ucl_x"),
        F.round(lcl_x, 4).alias("lcl_x"),
        F.round(_XS_B4 * F.col("sbar"), 4).alias("ucl_s"),
        F.round(_XS_B3 * F.col("sbar"), 4).alias("lcl_s"),
        ((F.col("xbar") > ucl_x) | (F.col("xbar") < lcl_x)).alias(
            "mean_out"
        ),
        (
            (F.col("s") > _XS_B4 * F.col("sbar"))
            | (F.col("s") < _XS_B3 * F.col("sbar"))
        ).alias("spread_out"),
    ).orderBy("d")


# ===========================================================================
# R481 — EWMA control chart
# ===========================================================================

@register(
    "q_ewma_chart",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    seq AS (
      SELECT d, c, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily
    ),
    stats AS (
      SELECT AVG(c * 1.0) AS mu,
             sqrt(SUM((c - (SELECT AVG(c * 1.0) FROM daily))
                      * (c - (SELECT AVG(c * 1.0) FROM daily)))
                  / (COUNT(*) - 1)) AS sd
      FROM daily
    ),
    z AS (
      SELECT a.d, a.c, a.t,
             POWER(1 - {_EW_LAMBDA}, a.t) * stats.mu
             + {_EW_LAMBDA} * SUM(POWER(1 - {_EW_LAMBDA}, a.t - b.t)
                                  * b.c) AS z
      FROM seq a JOIN seq b ON b.t <= a.t
      CROSS JOIN stats
      GROUP BY a.d, a.c, a.t, stats.mu
    )
    SELECT z.d, CAST(z.c AS BIGINT) AS observed,
           round(z.z, 4) AS ewma,
           round(stats.mu + {_EW_L} * stats.sd
                 * sqrt({_EW_LAMBDA} / (2 - {_EW_LAMBDA})
                        * (1 - POWER(1 - {_EW_LAMBDA}, 2 * z.t))), 4)
             AS ucl,
           round(stats.mu - {_EW_L} * stats.sd
                 * sqrt({_EW_LAMBDA} / (2 - {_EW_LAMBDA})
                        * (1 - POWER(1 - {_EW_LAMBDA}, 2 * z.t))), 4)
             AS lcl,
           z.z > stats.mu + {_EW_L} * stats.sd
                 * sqrt({_EW_LAMBDA} / (2 - {_EW_LAMBDA})
                        * (1 - POWER(1 - {_EW_LAMBDA}, 2 * z.t)))
             OR z.z < stats.mu - {_EW_L} * stats.sd
                 * sqrt({_EW_LAMBDA} / (2 - {_EW_LAMBDA})
                        * (1 - POWER(1 - {_EW_LAMBDA}, 2 * z.t)))
             AS out_of_control
    FROM z CROSS JOIN stats ORDER BY z.d
    """,
)
def q_ewma_chart(spark, sf_dir):
    """R481 — EWMA chart over daily counts, λ={l}, L={L}: z_0 = the
    grand mean (the standard in-control target init), recursion
    expanded to the closed triangular form z_t = (1−λ)^t·μ +
    λΣ(1−λ)^(t−i)x_i computed as a bounded day×day join (≤31² cells,
    NO window), limits ±L·σ̂·√(λ/(2−λ)·(1−(1−λ)^(2t))) that widen to
    their asymptote. The small-persistent-shift detector next to the
    X̄ chart's gross-point alarms.""".format(l=_EW_LAMBDA, L=_EW_L)
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    seq = daily.select(
        "d", "c", F.row_number().over(Window.orderBy("d")).alias("t")
    )
    mu_f = daily.agg(F.avg(F.col("c") * 1.0).alias("mu"))
    stats = daily.crossJoin(F.broadcast(mu_f)).agg(
        F.max("mu").alias("mu"),
        F.sqrt(
            F.sum((F.col("c") - F.col("mu")) * (F.col("c") - F.col("mu")))
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
    )
    a = seq.select(
        F.col("d").alias("da"), F.col("c").alias("ca"),
        F.col("t").alias("ta"),
    )
    b = seq.select(F.col("t").alias("tb"), F.col("c").alias("cb"))
    lam = _EW_LAMBDA
    z = (
        a.join(b, F.col("tb") <= F.col("ta"))
        .crossJoin(F.broadcast(stats))
        .groupBy("da", "ca", "ta", "mu", "sd")
        .agg(
            F.sum(
                F.pow(F.lit(1 - lam), F.col("ta") - F.col("tb"))
                * F.col("cb")
            ).alias("wsum")
        )
        .select(
            "da",
            "ca",
            "ta",
            "mu",
            "sd",
            (
                F.pow(F.lit(1 - lam), F.col("ta")) * F.col("mu")
                + lam * F.col("wsum")
            ).alias("z"),
        )
    )
    halfw = (
        _EW_L * F.col("sd")
        * F.sqrt(
            F.lit(lam / (2 - lam))
            * (1 - F.pow(F.lit(1 - lam), 2 * F.col("ta")))
        )
    )
    return z.select(
        F.col("da").alias("d"),
        F.col("ca").cast("long").alias("observed"),
        F.round("z", 4).alias("ewma"),
        F.round(F.col("mu") + halfw, 4).alias("ucl"),
        F.round(F.col("mu") - halfw, 4).alias("lcl"),
        (
            (F.col("z") > F.col("mu") + halfw)
            | (F.col("z") < F.col("mu") - halfw)
        ).alias("out_of_control"),
    ).orderBy("d")
