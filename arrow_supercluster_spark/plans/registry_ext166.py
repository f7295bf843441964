"""Round-6 registry additions, batch 161 — portmanteau and
heteroskedasticity diagnostics for the daily series:

- q_ljung_box: Ljung-Box portmanteau test at h=5 lags on the
  trend-fit residuals — Q = n(n+2)·Σ r_k²/(n−k) vs χ²(5).
  q_durbin_watson sees ONLY lag-1 structure; LB aggregates the whole
  short-lag ACF into one verdict (the standard residual-whiteness
  gate after any fit).
- q_arch_lm: Engle's ARCH LM test — regress e²_t on e²_{t−1}, LM =
  n·R² vs χ²(1). Detects variance CLUSTERING the mean-model
  diagnostics can't see; the time-series sibling of q_breusch_pagan
  (which regresses e² on the REGRESSOR, not on its own past).
- q_variance_ratio: Lo-MacKinlay variance ratio at q=5 on the
  cumulative daily-count walk — VR = Var(5-step sums)/(5·Var(1-step))
  with overlapping windows and the unbiased scaling. VR ≈ 1 for a
  random walk; mean-reverting series (like a stationary daily count's
  cumulative sum... which is TRENDING, so the demeaned increments are
  used) push VR below 1.

At 100 TB: all three collapse to the ≤31-day frame; the lag
machinery is adjacent-day equi-joins, the same calendar-bounded
shape as q_durbin_watson.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_LB_H = 5
_LB_CRIT = 11.07  # chi2(5) at 5%
_ARCH_CRIT = 3.841  # chi2(1) at 5%
_VR_Q = 5

_SQL_RESID = """
    daily AS (
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
                 * (sx * 1.0 / n) AS b0,
             n
      FROM reg
    ),
    resid AS (
      SELECT daily.d, daily.c - (fit.b0 + fit.slope * daily.d) AS e
      FROM daily CROSS JOIN fit
    )
"""


# ===========================================================================
# R476 — Ljung-Box portmanteau test
# ===========================================================================

@register(
    "q_ljung_box",
    f"""
    WITH {_SQL_RESID},
    ss AS (SELECT SUM(e * e) AS den,
                  CAST(COUNT(*) AS BIGINT) AS n FROM resid),
    lags AS (SELECT UNNEST(range(1, {_LB_H} + 1)) AS k),
    acf AS (
      SELECT lags.k,
             SUM(a.e * b.e) / (SELECT den FROM ss) AS r
      FROM lags
      JOIN resid a ON TRUE
      JOIN resid b ON b.d = a.d + lags.k
      GROUP BY lags.k
    ),
    q AS (
      SELECT SUM(acf.r * acf.r / (ss.n - acf.k)) * ss.n * (ss.n + 2)
               AS lb
      FROM acf CROSS JOIN ss GROUP BY ss.n
    )
    SELECT (SELECT n FROM ss) AS n_days, {_LB_H} AS n_lags,
           round(q.lb, 4) AS ljung_box_q,
           q.lb > {_LB_CRIT} AS residuals_not_white
    FROM q
    """,
)
def q_ljung_box(spark, sf_dir):
    """R476 — Ljung-Box at h={h} on the daily trend residuals: sample
    ACF r_k via adjacent-day joins over the full-series centered...
    strictly the residual sum of squares (residuals already have ~0
    mean under OLS), Q = n(n+2)Σ r_k²/(n−k) vs χ²({h}) = {c}. The
    whole-short-lag whiteness gate that q_durbin_watson's lag-1 scan
    under-covers.""".format(h=_LB_H, c=_LB_CRIT)
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
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        (F.col("c") - (F.col("b0") + F.col("slope") * F.col("d"))).alias(
            "e"
        ),
    )
    ss = resid.agg(
        F.sum(F.col("e") * F.col("e")).alias("den"),
        F.count(F.lit(1)).alias("n"),
    )
    lags = spark.range(1, _LB_H + 1).select(F.col("id").alias("k"))
    a = resid.select("d", "e")
    b = resid.select(F.col("d").alias("db"), F.col("e").alias("eb"))
    acf = (
        lags.crossJoin(a)
        .join(b, F.col("db") == F.col("d") + F.col("k"))
        .groupBy("k")
        .agg(F.sum(F.col("e") * F.col("eb")).alias("num"))
        .crossJoin(F.broadcast(ss))
        .select("k", (F.col("num") / F.col("den")).alias("r"), "n")
    )
    q = acf.groupBy("n").agg(
        (
            F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("k")))
            * F.col("n") * (F.col("n") + 2)
        ).alias("lb")
    )
    return q.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(_LB_H).alias("n_lags"),
        F.round("lb", 4).alias("ljung_box_q"),
        (F.col("lb") > _LB_CRIT).alias("residuals_not_white"),
    )


# ===========================================================================
# R477 — Engle's ARCH LM test
# ===========================================================================

@register(
    "q_arch_lm",
    f"""
    WITH {_SQL_RESID},
    sq AS (SELECT d, e * e AS u FROM resid),
    pairs AS (
      SELECT cur.u AS u, prev.u AS ul
      FROM sq cur JOIN sq prev ON prev.d = cur.d - 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(ul) AS sx, SUM(u) AS sy,
             SUM(ul * u) AS sxy, SUM(ul * ul) AS sxx,
             SUM(u * u) AS syy
      FROM pairs
    ),
    r AS (
      SELECT n,
             (sxy - sx * sy / n) * (sxy - sx * sy / n)
               / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS r2
      FROM s
    )
    SELECT n AS n_pairs, round(n * r2, 4) AS arch_lm,
           n * r2 > {_ARCH_CRIT} AS arch_effect
    FROM r
    """,
)
def q_arch_lm(spark, sf_dir):
    """R477 — Engle's ARCH(1) LM on the trend residuals: regress e²_t
    on e²_{{t−1}} over adjacent days, LM = n·R² vs χ²(1) = {c}.
    Rejecting means the variance itself is autocorrelated — vol
    clustering — and homoskedastic intervals (and q_breusch_pagan's
    regressor-based check) miss it.""".format(c=_ARCH_CRIT)
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
    sq = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        (
            (F.col("c") - (F.col("b0") + F.col("slope") * F.col("d")))
            * (F.col("c") - (F.col("b0") + F.col("slope") * F.col("d")))
        ).alias("u"),
    )
    prev = sq.select((F.col("d") + 1).alias("d"), F.col("u").alias("ul"))
    pairs = sq.join(prev, "d").select("u", "ul")
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ul").alias("sx"),
        F.sum("u").alias("sy"),
        F.sum(F.col("ul") * F.col("u")).alias("sxy"),
        F.sum(F.col("ul") * F.col("ul")).alias("sxx"),
        F.sum(F.col("u") * F.col("u")).alias("syy"),
    )
    r2 = (
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
        * (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
    ) / (
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
    )
    return s.select(
        F.col("n").cast("long").alias("n_pairs"),
        F.round(F.col("n") * r2, 4).alias("arch_lm"),
        (F.col("n") * r2 > _ARCH_CRIT).alias("arch_effect"),
    )


# ===========================================================================
# R478 — Lo-MacKinlay variance ratio
# ===========================================================================

@register(
    "q_variance_ratio",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mu AS (SELECT AVG(c * 1.0) AS m,
                  CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    inc AS (
      SELECT d, c - mu.m AS x FROM daily CROSS JOIN mu
    ),
    v1 AS (
      SELECT SUM(x * x) / (mu.n - 1) AS v
      FROM inc CROSS JOIN mu GROUP BY mu.n
    ),
    sums AS (
      SELECT a.d,
             SUM(b.x) AS s
      FROM inc a JOIN inc b ON b.d BETWEEN a.d AND a.d + {_VR_Q} - 1
      GROUP BY a.d
      HAVING COUNT(*) = {_VR_Q}
    ),
    vq AS (
      SELECT SUM(s * s) / (COUNT(*) - 1) AS v,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM sums
    )
    SELECT (SELECT n FROM mu) AS n_days, {_VR_Q} AS q,
           vq.m AS n_windows,
           round(vq.v / ({_VR_Q} * v1.v), 4) AS variance_ratio,
           vq.v / ({_VR_Q} * v1.v) < 1 AS mean_reverting
    FROM vq CROSS JOIN v1
    """,
)
def q_variance_ratio(spark, sf_dir):
    """R478 — Lo-MacKinlay VR(q={q}) over the DEMEANED daily counts
    (treated as the increments of a latent walk): VR = Var(Σ of q
    consecutive increments)/(q·Var(single)) with overlapping windows
    that fit entirely in the calendar (HAVING count = q). VR ≈ 1 ⇔
    uncorrelated increments; a stationary/mean-reverting series drives
    VR < 1 (the fixture's counts do — asserted), trending momentum
    pushes VR > 1. The asymptotic z band is not computed — the VR
    point estimate is the deliverable, stated.""".format(q=_VR_Q)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mu = daily.agg(
        F.avg(F.col("c") * 1.0).alias("m"), F.count(F.lit(1)).alias("n")
    )
    inc = daily.crossJoin(F.broadcast(mu)).select(
        "d", (F.col("c") - F.col("m")).alias("x"), "n"
    )
    v1 = inc.groupBy("n").agg(
        (F.sum(F.col("x") * F.col("x")) / (F.col("n") - 1)).alias("v1v")
    )
    a = inc.select(F.col("d").alias("da"))
    b = inc.select(F.col("d").alias("db"), "x")
    sums = (
        a.join(
            b,
            (F.col("db") >= F.col("da"))
            & (F.col("db") <= F.col("da") + _VR_Q - 1),
        )
        .groupBy("da")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") == _VR_Q)
    )
    vq = sums.agg(
        (
            F.sum(F.col("s") * F.col("s")) / (F.count(F.lit(1)) - 1)
        ).alias("vqv"),
        F.count(F.lit(1)).alias("m"),
    )
    j = vq.crossJoin(F.broadcast(v1))
    vr = F.col("vqv") / (_VR_Q * F.col("v1v"))
    return j.select(
        F.col("n").cast("long").alias("n_days"),
        F.lit(_VR_Q).alias("q"),
        F.col("m").cast("long").alias("n_windows"),
        F.round(vr, 4).alias("variance_ratio"),
        (vr < 1).alias("mean_reverting"),
    )
