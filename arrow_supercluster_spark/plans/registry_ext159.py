"""Round-6 registry additions, batch 154 — the post-ANOVA toolkit:

- q_levene: Brown-Forsythe (median-centered Levene) test of variance
  homogeneity across the five event-type value distributions — the
  PREREQUISITE check for q_anova_f: pooled-variance F is only valid
  when the groups share a variance, and this is the test that says so.
  Median-centered (the robust Brown-Forsythe form) because the value
  distributions are right-skewed.
- q_tukey_hsd: Tukey's honest significant difference after ANOVA —
  all C(5,2) pairwise mean contrasts against q·√(MSW/2·(1/nᵢ+1/nⱼ))
  with the studentized-range 5% critical for k=5, large df (a stated
  constant, the q_chow_test convention). Which PAIRS differ, with the
  family-wise error controlled — the follow-up every significant
  ANOVA owes.
- q_pacf: partial autocorrelation of the daily count series at lags
  1..5 via the Durbin-Levinson recursion on the sample ACF. The
  AR-order fingerprint q_autocorrelation (plain ACF) cannot show:
  PACF cuts off at the true AR order. Rows-only (the recursion runs
  driver-side on the ≤5 collected ACF values — bounded, allowlisted);
  python oracle replays DL independently.

At 100 TB: Levene/Tukey collapse to per-group scalars (two
partial-aggregated passes — one for medians, one for deviations);
PACF collapses to ≤31 day rows then ≤5 ACF scalars.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_LV_CRIT = 2.372  # F(4, inf) at 5% — stated constant for the verdict
_THSD_Q = 3.858  # studentized range q(5, inf) at 5%
_PACF_LAGS = 5


# ===========================================================================
# R455 — Brown-Forsythe / Levene variance-homogeneity test
# ===========================================================================

@register(
    "q_levene",
    f"""
    WITH vals AS (
      SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    med AS (
      SELECT g, quantile_cont(c, 0.5) AS m FROM vals GROUP BY g
    ),
    z AS (
      SELECT vals.g, abs(vals.c - med.m) AS z
      FROM vals JOIN med ON vals.g = med.g
    ),
    zg AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n, AVG(z) AS zbar
      FROM z GROUP BY g
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(n * zbar) / SUM(n) AS zz
      FROM zg
    ),
    num AS (
      SELECT SUM(zg.n * (zg.zbar - tot.zz) * (zg.zbar - tot.zz)) AS b
      FROM zg CROSS JOIN tot
    ),
    den AS (
      SELECT SUM((z.z - zg.zbar) * (z.z - zg.zbar)) AS w
      FROM z JOIN zg ON z.g = zg.g
    )
    SELECT tot.nn AS n, tot.k,
           round((tot.nn - tot.k) * 1.0 / (tot.k - 1) * num.b / den.w, 4)
             AS levene_w,
           (tot.nn - tot.k) * 1.0 / (tot.k - 1) * num.b / den.w
             > {_LV_CRIT} AS variances_differ
    FROM tot CROSS JOIN num CROSS JOIN den
    """,
)
def q_levene(spark, sf_dir):
    """R455 — Brown-Forsythe over event-type values (exact integer
    cents): z = |x − group median| (quantile_cont/percentile agree
    exactly on the 0.5 point of integers), W = ((N−k)/(k−1))·B/W_ss —
    the one-way ANOVA of the absolute deviations. Verdict vs the
    F(4, ∞) 5% critical {c} (stated constant). Two grouped passes;
    scipy.stats.levene(center='median') is the test oracle.""".format(
        c=_LV_CRIT
    )
    ev = read_events(spark, sf_dir)
    vals = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    med = vals.groupBy("g").agg(F.expr("percentile(c, 0.5)").alias("m"))
    z = vals.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("c") - F.col("m")).alias("z")
    )
    zg = z.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.avg("z").alias("zbar")
    )
    tot = zg.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        (F.sum(F.col("n") * F.col("zbar")) / F.sum("n")).alias("zz"),
    )
    num = zg.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.col("n") * (F.col("zbar") - F.col("zz"))
            * (F.col("zbar") - F.col("zz"))
        ).alias("b")
    )
    den = z.join(F.broadcast(zg), "g").agg(
        F.sum(
            (F.col("z") - F.col("zbar")) * (F.col("z") - F.col("zbar"))
        ).alias("w")
    )
    j = tot.crossJoin(F.broadcast(num)).crossJoin(F.broadcast(den))
    w = (
        (F.col("nn") - F.col("k")) * 1.0 / (F.col("k") - 1)
        * F.col("b") / F.col("w")
    )
    return j.select(
        F.col("nn").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(w, 4).alias("levene_w"),
        (w > _LV_CRIT).alias("variances_differ"),
    )


# ===========================================================================
# R456 — Tukey's HSD post-hoc pairwise contrasts
# ===========================================================================

@register(
    "q_tukey_hsd",
    f"""
    WITH vals AS (
      SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    gstats AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(c) / (100.0 * COUNT(*)) AS mean_v
      FROM vals GROUP BY g
    ),
    msw AS (
      SELECT SUM((vals.c / 100.0 - gstats.mean_v)
                 * (vals.c / 100.0 - gstats.mean_v))
             / ((SELECT SUM(n) FROM gstats)
                - (SELECT COUNT(*) FROM gstats)) AS msw
      FROM vals JOIN gstats ON vals.g = gstats.g
    )
    SELECT a.g AS group_a, b.g AS group_b,
           round(a.mean_v - b.mean_v, 4) AS mean_diff,
           round({_THSD_Q} * sqrt(msw.msw / 2
                 * (1.0 / a.n + 1.0 / b.n)), 4) AS hsd_threshold,
           abs(a.mean_v - b.mean_v)
             > {_THSD_Q} * sqrt(msw.msw / 2 * (1.0 / a.n + 1.0 / b.n))
             AS significant
    FROM gstats a JOIN gstats b ON a.g < b.g
    CROSS JOIN msw
    ORDER BY a.g, b.g
    """,
)
def q_tukey_hsd(spark, sf_dir):
    """R456 — Tukey HSD over the event-type value means: all C(k,2)
    contrasts vs q·√(MSW/2·(1/nᵢ+1/nⱼ)) with q(5, ∞) = {q} at 5%
    (stated constant). MSW is the one-way ANOVA within mean square
    from exact integer cents. The group table is k rows — the pair
    stage is a broadcast k×k corner, nothing scales with the corpus.
    scipy.stats.tukey_hsd cross-checks the mean differences and the
    accept/reject pattern in tests.""".format(q=_THSD_Q)
    ev = read_events(spark, sf_dir)
    vals = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    gstats = vals.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("c") / (100.0 * F.count(F.lit(1)))).alias("mean_v"),
    )
    dims = gstats.agg(
        F.sum("n").alias("nn"), F.count(F.lit(1)).alias("k")
    )
    msw = (
        vals.join(F.broadcast(gstats), "g")
        .crossJoin(F.broadcast(dims))
        .agg(
            (
                F.sum(
                    (F.col("c") / 100.0 - F.col("mean_v"))
                    * (F.col("c") / 100.0 - F.col("mean_v"))
                )
                / (F.max("nn") - F.max("k"))
            ).alias("msw")
        )
    )
    a = gstats.select(
        F.col("g").alias("group_a"),
        F.col("n").alias("na"),
        F.col("mean_v").alias("ma"),
    )
    b = gstats.select(
        F.col("g").alias("group_b"),
        F.col("n").alias("nb"),
        F.col("mean_v").alias("mb"),
    )
    thresh = _THSD_Q * F.sqrt(
        F.col("msw") / 2 * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(msw))
        .select(
            "group_a",
            "group_b",
            F.round(F.col("ma") - F.col("mb"), 4).alias("mean_diff"),
            F.round(thresh, 4).alias("hsd_threshold"),
            (F.abs(F.col("ma") - F.col("mb")) > thresh).alias(
                "significant"
            ),
        )
        .orderBy("group_a", "group_b")
    )


# ===========================================================================
# R457 — partial autocorrelation (Durbin-Levinson)
# ===========================================================================

_PACF_SQL = """
    WITH daily AS (
      SELECT day(ts) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    mu AS (SELECT AVG(c * 1.0) AS m FROM daily),
    x AS (SELECT d, c - mu.m AS e FROM daily CROSS JOIN mu),
    acf AS MATERIALIZED (
      SELECT round((SELECT SUM(a.e * b.e) FROM x a JOIN x b ON b.d = a.d + 1) / (SELECT SUM(e * e) FROM x), 9) AS a1,
             round((SELECT SUM(a.e * b.e) FROM x a JOIN x b ON b.d = a.d + 2) / (SELECT SUM(e * e) FROM x), 9) AS a2,
             round((SELECT SUM(a.e * b.e) FROM x a JOIN x b ON b.d = a.d + 3) / (SELECT SUM(e * e) FROM x), 9) AS a3,
             round((SELECT SUM(a.e * b.e) FROM x a JOIN x b ON b.d = a.d + 4) / (SELECT SUM(e * e) FROM x), 9) AS a4,
             round((SELECT SUM(a.e * b.e) FROM x a JOIN x b ON b.d = a.d + 5) / (SELECT SUM(e * e) FROM x), 9) AS a5
    ),
    l1 AS MATERIALIZED (SELECT acf.*, a1 AS p1, a1 AS f1_1 FROM acf),
    l2a AS MATERIALIZED (SELECT l1.*, (a2 - (f1_1 * a1)) / (1 - (f1_1 * a1)) AS p2 FROM l1),
    l2 AS MATERIALIZED (SELECT l2a.*, f1_1 - p2 * f1_1 AS f2_1, p2 AS f2_2 FROM l2a),
    l3a AS MATERIALIZED (SELECT l2.*, (a3 - (f2_1 * a2 + f2_2 * a1)) / (1 - (f2_1 * a1 + f2_2 * a2)) AS p3 FROM l2),
    l3 AS MATERIALIZED (SELECT l3a.*, f2_1 - p3 * f2_2 AS f3_1, f2_2 - p3 * f2_1 AS f3_2, p3 AS f3_3 FROM l3a),
    l4a AS MATERIALIZED (SELECT l3.*, (a4 - (f3_1 * a3 + f3_2 * a2 + f3_3 * a1)) / (1 - (f3_1 * a1 + f3_2 * a2 + f3_3 * a3)) AS p4 FROM l3),
    l4 AS MATERIALIZED (SELECT l4a.*, f3_1 - p4 * f3_3 AS f4_1, f3_2 - p4 * f3_2 AS f4_2, f3_3 - p4 * f3_1 AS f4_3, p4 AS f4_4 FROM l4a),
    l5a AS MATERIALIZED (SELECT l4.*, (a5 - (f4_1 * a4 + f4_2 * a3 + f4_3 * a2 + f4_4 * a1)) / (1 - (f4_1 * a1 + f4_2 * a2 + f4_3 * a3 + f4_4 * a4)) AS p5 FROM l4),
    l5 AS MATERIALIZED (SELECT l5a.*, f4_1 - p5 * f4_4 AS f5_1, f4_2 - p5 * f4_3 AS f5_2, f4_3 - p5 * f4_2 AS f5_3, f4_4 - p5 * f4_1 AS f5_4, p5 AS f5_5 FROM l5a)
    SELECT CAST(lag AS INTEGER) AS lag, acf, pacf FROM (SELECT 1 AS lag, round(a1, 6) AS acf, round(p1, 6) AS pacf FROM l5 UNION ALL SELECT 2 AS lag, round(a2, 6) AS acf, round(p2, 6) AS pacf FROM l5 UNION ALL SELECT 3 AS lag, round(a3, 6) AS acf, round(p3, 6) AS pacf FROM l5 UNION ALL SELECT 4 AS lag, round(a4, 6) AS acf, round(p4, 6) AS pacf FROM l5 UNION ALL SELECT 5 AS lag, round(a5, 6) AS acf, round(p5, 6) AS pacf FROM l5)
    ORDER BY lag
    """


@register("q_pacf", _PACF_SQL)
def q_pacf(spark, sf_dir):
    """R457 — PACF of the daily count series at lags 1..{k} via
    Durbin-Levinson on the sample ACF (denominator = full-series
    centered sum of squares, the standard biased estimator). The ≤{k}
    ACF scalars collapse to the driver (bounded, collect-gate
    allowlisted) and DL runs there — the recursion is k² scalar ops,
    not a data-scale job. Rows-only; the test replays DL independently
    and cross-checks the lag-1 PACF against ACF(1) exactly.
    SQL twin since r7: the {k}-lag DL recursion unrolls as single-row
    CTE levels with the SAME term order and a round-9 on the ACF
    scalars, so both engines run identical arithmetic.""".format(
        k=_PACF_LAGS
    )
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mu = daily.agg(F.avg(F.col("c") * 1.0).alias("mu"))
    x = daily.crossJoin(F.broadcast(mu)).select(
        "d", (F.col("c") - F.col("mu")).alias("e")
    )
    den = x.agg(F.sum(F.col("e") * F.col("e")).alias("ss")).collect()[0].ss
    acf = []
    for k in range(1, _PACF_LAGS + 1):
        lagged = x.select((F.col("d") + k).alias("d"), F.col("e").alias("el"))
        num = (
            x.join(lagged, "d")
            .agg(F.sum(F.col("e") * F.col("el")).alias("s"))
            .collect()[0]
            .s
        )
        # round-9 before DL (r7 SQL-twin discipline): both engines
        # hand the recursion bit-identical scalars
        acf.append(round(num / den, 9))
    # Durbin-Levinson
    phi_prev: list[float] = []
    pacf = []
    for k in range(1, _PACF_LAGS + 1):
        if k == 1:
            phi_kk = acf[0]
            phi = [phi_kk]
        else:
            num = acf[k - 1] - sum(
                phi_prev[j] * acf[k - 2 - j] for j in range(k - 1)
            )
            den_k = 1 - sum(
                phi_prev[j] * acf[j] for j in range(k - 1)
            )
            phi_kk = num / den_k
            phi = [
                phi_prev[j] - phi_kk * phi_prev[k - 2 - j]
                for j in range(k - 1)
            ] + [phi_kk]
        pacf.append(phi_kk)
        phi_prev = phi
    rows = [
        (k + 1, round(float(acf[k]), 6), round(float(pacf[k]), 6))
        for k in range(_PACF_LAGS)
    ]
    return spark.createDataFrame(rows, "lag int, acf double, pacf double")
