"""Round-6 registry additions, batch 145 — distributional and
structural regression diagnostics:

- q_jarque_bera: Jarque-Bera normality test on the purchase-value
  distribution — skewness and excess kurtosis from EXACT integer power
  sums (values rounded to whole units so x^4 sums stay inside int64
  through sf10), JB = n/6·(S² + K²/4) against the 5% χ²(2) critical.
  The distributional audit behind every "mean ± z·σ" claim downstream
  (q_zscore_outliers, q_bootstrap_ci): if JB rejects, those bands are
  built on the wrong reference.
- q_breusch_pagan: Breusch-Pagan heteroscedasticity LM test on the
  daily-count trend residuals — regress e² on the day, LM = n·R²
  against χ²(1). Completes the OLS assumption audit started by
  q_durbin_watson (serial correlation) with the variance-structure
  check; same exact-integer-regression-sum machinery.
- q_chow_test: Chow structural-break F-test at mid-month — fit the
  trend on days 1-15, days 16+, and pooled; F = ((SSR_p − SSR_1 −
  SSR_2)/k) / ((SSR_1+SSR_2)/(n−2k)) with k=2. The "did the process
  CHANGE" question q_interrupted_ts answers with a known break date,
  asked as a hypothesis test.

At 100 TB: every query here collapses the corpus to per-day (≤ 31
rows) or to five scalar power sums in ONE partial-aggregated pass —
no shuffle grows with the data; the closed forms run on the driver
side of a 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_JB_CRIT = 5.991  # chi2(2) at 5%
_BP_CRIT = 3.841  # chi2(1) at 5%
_CHOW_CRIT = 3.369  # F(2, 26) at 5% — the 30-day fixture's df
_CHOW_SPLIT = 16  # first day of the second regime


# ===========================================================================
# R428 — Jarque-Bera normality test
# ===========================================================================

@register(
    "q_jarque_bera",
    f"""
    WITH v AS (
      SELECT CAST(round(value) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS s1,
             CAST(SUM(x * x) AS DOUBLE) AS s2,
             CAST(SUM(x * x * x) AS DOUBLE) AS s3,
             CAST(SUM(x * x * x * x) AS DOUBLE) AS s4
      FROM v
    ),
    m AS (
      SELECT n,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s
    ),
    k AS (
      SELECT n, m3 / (m2 * sqrt(m2)) AS skew,
             m4 / (m2 * m2) - 3 AS exkurt
      FROM m
    )
    SELECT n, round(skew, 4) AS skewness,
           round(exkurt, 4) AS excess_kurtosis,
           round(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0), 4)
             AS jarque_bera,
           n / 6.0 * (skew * skew + exkurt * exkurt / 4.0) > {_JB_CRIT}
             AS normal_rejected
    FROM k
    """,
)
def q_jarque_bera(spark, sf_dir):
    """R428 — Jarque-Bera on purchase values: whole-unit integer
    rounding keeps Σx⁴ exactly representable in int64 (max value 476 ⇒
    x⁴ ≤ 5.1e10; ~2e4 rows/sf0.1 ⇒ sums ≤ 1e15, headroom to sf10 —
    the cents scale of q_hoeffding_certificate would overflow at x⁴),
    so both engines derive the central moments from the SAME five
    exact integers via the same closed form; only the final rational
    expressions are floating point. One partial-aggregated scan,
    1-row output."""
    ev = read_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    v = ev.select(F.round("value").cast("long").alias("x"))
    s = v.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).cast("double").alias("s3"),
        F.sum(
            F.col("x") * F.col("x") * F.col("x") * F.col("x")
        ).cast("double").alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = (
        F.col("s3") / F.col("n")
        - 3 * mu * (F.col("s2") / F.col("n"))
        + 2 * mu * mu * mu
    )
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    k = s.select(
        F.col("n"),
        (m3 / (m2 * F.sqrt(m2))).alias("skew"),
        (m4 / (m2 * m2) - 3).alias("exkurt"),
    )
    jb = F.col("n") / 6.0 * (
        F.col("skew") * F.col("skew")
        + F.col("exkurt") * F.col("exkurt") / 4.0
    )
    return k.select(
        F.col("n").cast("long").alias("n"),
        F.round("skew", 4).alias("skewness"),
        F.round("exkurt", 4).alias("excess_kurtosis"),
        F.round(jb, 4).alias("jarque_bera"),
        (jb > _JB_CRIT).alias("normal_rejected"),
    )


# ===========================================================================
# R429 — Breusch-Pagan heteroscedasticity test
# ===========================================================================

_SQL_DAILY_FIT = """
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


@register(
    "q_breusch_pagan",
    f"""
    WITH {_SQL_DAILY_FIT},
    u AS (SELECT d, e * e AS u FROM resid),
    su AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(d * 1.0) AS sd, SUM(u) AS su,
             SUM(d * 1.0 * u) AS sdu, SUM(d * 1.0 * d) AS sdd,
             SUM(u * u) AS suu
      FROM u
    ),
    r AS (
      SELECT n,
             (sdu - sd * su / n) * (sdu - sd * su / n)
               / ((sdd - sd * sd / n) * (suu - su * su / n)) AS r2
      FROM su
    )
    SELECT n AS n_days, round(n * r2, 4) AS bp_lm,
           n * r2 > {_BP_CRIT} AS heteroscedastic
    FROM r
    """,
)
def q_breusch_pagan(spark, sf_dir):
    """R429 — Breusch-Pagan on the daily-count trend fit: OLS from
    exact integer regression sums (the q_durbin_watson frame), then
    the LM statistic n·R² of e² regressed on the day, vs χ²(1) at 5%.
    DW audits WHEN the residuals err (serial structure); BP audits
    HOW MUCH they err as the regressor grows (variance structure) —
    rejecting means the trend's OLS standard errors need robust
    (White) replacements. Calendar-bounded frame, 1-row output."""
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
    u = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        (
            (F.col("c") - (F.col("b0") + F.col("slope") * F.col("d")))
            * (F.col("c") - (F.col("b0") + F.col("slope") * F.col("d")))
        ).alias("u"),
    )
    su = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("d") * 1.0).alias("sd"),
        F.sum("u").alias("su"),
        F.sum(F.col("d") * 1.0 * F.col("u")).alias("sdu"),
        F.sum(F.col("d") * 1.0 * F.col("d")).alias("sdd"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
    )
    r2 = (
        (F.col("sdu") - F.col("sd") * F.col("su") / F.col("n"))
        * (F.col("sdu") - F.col("sd") * F.col("su") / F.col("n"))
    ) / (
        (F.col("sdd") - F.col("sd") * F.col("sd") / F.col("n"))
        * (F.col("suu") - F.col("su") * F.col("su") / F.col("n"))
    )
    return su.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(F.col("n") * r2, 4).alias("bp_lm"),
        (F.col("n") * r2 > _BP_CRIT).alias("heteroscedastic"),
    )


# ===========================================================================
# R430 — Chow structural-break test
# ===========================================================================

_SQL_GRP_SSR = """
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(d) AS sx, SUM(c) AS sy,
             SUM(d * c) AS sxy, SUM(d * d) AS sxx,
             SUM(c * c) AS syy
"""


@register(
    "q_chow_test",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    g1 AS ({_SQL_GRP_SSR} FROM daily WHERE d < {_CHOW_SPLIT}),
    g2 AS ({_SQL_GRP_SSR} FROM daily WHERE d >= {_CHOW_SPLIT}),
    gf AS ({_SQL_GRP_SSR} FROM daily),
    ssr AS (
      SELECT
        (g1.syy - g1.sy * 1.0 * g1.sy / g1.n)
          - (g1.sxy - g1.sx * 1.0 * g1.sy / g1.n)
            * (g1.sxy - g1.sx * 1.0 * g1.sy / g1.n)
            / (g1.sxx - g1.sx * 1.0 * g1.sx / g1.n) AS ssr1,
        (g2.syy - g2.sy * 1.0 * g2.sy / g2.n)
          - (g2.sxy - g2.sx * 1.0 * g2.sy / g2.n)
            * (g2.sxy - g2.sx * 1.0 * g2.sy / g2.n)
            / (g2.sxx - g2.sx * 1.0 * g2.sx / g2.n) AS ssr2,
        (gf.syy - gf.sy * 1.0 * gf.sy / gf.n)
          - (gf.sxy - gf.sx * 1.0 * gf.sy / gf.n)
            * (gf.sxy - gf.sx * 1.0 * gf.sy / gf.n)
            / (gf.sxx - gf.sx * 1.0 * gf.sx / gf.n) AS ssrf,
        g1.n AS n1, g2.n AS n2
      FROM g1 CROSS JOIN g2 CROSS JOIN gf
    )
    SELECT n1, n2,
           round(ssr1 + ssr2, 4) AS ssr_split,
           round(ssrf, 4) AS ssr_pooled,
           round(((ssrf - ssr1 - ssr2) / 2.0)
                 / ((ssr1 + ssr2) / (n1 + n2 - 4.0)), 4) AS chow_f,
           ((ssrf - ssr1 - ssr2) / 2.0)
             / ((ssr1 + ssr2) / (n1 + n2 - 4.0)) > {_CHOW_CRIT}
             AS break_detected
    FROM ssr
    """,
)
def q_chow_test(spark, sf_dir):
    """R430 — Chow test for a trend break at day {split}: SSR of the
    pooled fit vs the sum of per-regime SSRs, F with (k, n−2k) df at
    k=2. All three fits reduce to six exact integer sums per group
    (SSR = Syy_c − Sxy_c²/Sxx_c); the verdict uses the F(2, 26)
    critical of the 30-day fixture, stated as a constant so both
    engines agree exactly. q_interrupted_ts estimates the break's
    SIZE given the date; this asks whether a break at the date is
    STATISTICALLY THERE at all.""".format(split=_CHOW_SPLIT)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )

    def grp(df, tag):
        return df.agg(
            F.count(F.lit(1)).alias(f"n{tag}"),
            F.sum("d").alias(f"sx{tag}"),
            F.sum("c").alias(f"sy{tag}"),
            F.sum(F.col("d") * F.col("c")).alias(f"sxy{tag}"),
            F.sum(F.col("d") * F.col("d")).alias(f"sxx{tag}"),
            F.sum(F.col("c") * F.col("c")).alias(f"syy{tag}"),
        )

    def ssr(tag):
        n = F.col(f"n{tag}")
        sx, sy = F.col(f"sx{tag}"), F.col(f"sy{tag}")
        sxy, sxx, syy = (
            F.col(f"sxy{tag}"), F.col(f"sxx{tag}"), F.col(f"syy{tag}")
        )
        return (syy - sy * 1.0 * sy / n) - (
            (sxy - sx * 1.0 * sy / n) * (sxy - sx * 1.0 * sy / n)
            / (sxx - sx * 1.0 * sx / n)
        )

    g1 = grp(daily.filter(F.col("d") < _CHOW_SPLIT), "1")
    g2 = grp(daily.filter(F.col("d") >= _CHOW_SPLIT), "2")
    gf = grp(daily, "f")
    j = g1.crossJoin(F.broadcast(g2)).crossJoin(F.broadcast(gf))
    ssr1, ssr2, ssrf = ssr("1"), ssr("2"), ssr("f")
    chow = ((ssrf - ssr1 - ssr2) / 2.0) / (
        (ssr1 + ssr2) / (F.col("n1") + F.col("n2") - 4.0)
    )
    return j.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(ssr1 + ssr2, 4).alias("ssr_split"),
        F.round(ssrf, 4).alias("ssr_pooled"),
        F.round(chow, 4).alias("chow_f"),
        (chow > _CHOW_CRIT).alias("break_detected"),
    )
