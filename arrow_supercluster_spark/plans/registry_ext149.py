"""Round-5 registry additions, batch 144 — sampling certificates,
paired model comparison, and regression influence:

- q_hoeffding_certificate: the deterministic-sample error CERTIFICATE
  — for the 10% portable-hash sample of purchase values, report the
  actual |sample mean − true mean| against the Hoeffding bound
  ε = (b−a)·√(ln(2/δ)/2n) at δ = 0.05. Sampling pipelines quote
  estimates; this query ships the estimate WITH its finite-sample
  guarantee and verifies the truth landed inside (it must, w.p. 95% —
  and deterministically here, checked).
- q_mcnemar: McNemar's paired test comparing the Markov next-event
  predictor against the majority baseline ON THE SAME test
  transitions — the discordant-pair χ² (with continuity correction)
  that says whether the accuracy gap is real. Unpaired tests waste
  the pairing; accuracy deltas without a test are anecdotes.
- q_cooks_distance: Cook's distance for every day in the daily-count
  trend fit — the closed-form simple-regression influence
  D_i = e_i²·h_i/(2s²(1−h_i)²) with leverage h_i = 1/n +
  (x_i−x̄)²/S_xx; flags the days that OWN the slope. The diagnostics
  companion to q_durbin_watson (DW audits residual structure, Cook's
  audits observation influence).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_P = 2147483647
_HC_DELTA = 0.05
_CD_TOP = 8


# ===========================================================================
# R425 — Hoeffding sampling certificate
# ===========================================================================

@register(
    "q_hoeffding_certificate",
    f"""
    WITH vals AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c,
             ((event_id % {_P}) * 2654435761 + 12345) % {_P} % 10 = 0
               AS sampled
      FROM events WHERE event_type = 'purchase'
    ),
    full_s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS s,
             MIN(c) AS lo, MAX(c) AS hi
      FROM vals
    ),
    samp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS s
      FROM vals WHERE sampled
    )
    SELECT full_s.n AS n_full, samp.n AS n_sample,
           round(full_s.s / (100.0 * full_s.n), 4) AS true_mean,
           round(samp.s / (100.0 * samp.n), 4) AS sample_mean,
           round(abs(samp.s / (100.0 * samp.n)
                     - full_s.s / (100.0 * full_s.n)), 4) AS actual_error,
           round((full_s.hi - full_s.lo) / 100.0
                 * sqrt(ln(2.0 / {_HC_DELTA}) / (2.0 * samp.n)), 4)
             AS hoeffding_eps,
           (abs(samp.s / (100.0 * samp.n)
                - full_s.s / (100.0 * full_s.n))
            <= (full_s.hi - full_s.lo) / 100.0
               * sqrt(ln(2.0 / {_HC_DELTA}) / (2.0 * samp.n)))
             AS within_bound
    FROM full_s CROSS JOIN samp
    """,
)
def q_hoeffding_certificate(spark, sf_dir):
    """R425 — sampling with a certificate: the deterministic 10%
    portable-hash sample's mean vs the true mean, against the
    Hoeffding ε = (b−a)√(ln(2/δ)/2n) at δ={d} (range from the
    observed min/max — the bounded-support assumption made explicit).
    Exact integer cents both sides; the verdict column checks the
    truth landed inside the band. At 100 TB you estimate from the
    sample and SHIP the ε with it — this query is the discipline,
    measured. Pairs with q_sample_hash (the sampler) and
    q_bootstrap_ci/q_jackknife_ratio (the data-driven bands; Hoeffding
    is the assumption-light worst case).""".format(d=_HC_DELTA)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "purchase"
    )
    vals = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("c"),
        (
            (F.pmod("event_id", F.lit(_P)) * 2654435761 + 12345)
            % _P
            % 10
            == 0
        ).alias("sampled"),
    )
    full_s = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.min("c").alias("lo"),
        F.max("c").alias("hi"),
    )
    samp = vals.filter("sampled").agg(
        F.count(F.lit(1)).alias("ns"), F.sum("c").alias("ss")
    )
    j = full_s.crossJoin(F.broadcast(samp))
    true_m = F.col("s") / (100.0 * F.col("n"))
    samp_m = F.col("ss") / (100.0 * F.col("ns"))
    eps = (
        (F.col("hi") - F.col("lo"))
        / 100.0
        * F.sqrt(F.lit(math.log(2.0 / _HC_DELTA)) / (2.0 * F.col("ns")))
    )
    return j.select(
        F.col("n").cast("long").alias("n_full"),
        F.col("ns").cast("long").alias("n_sample"),
        F.round(true_m, 4).alias("true_mean"),
        F.round(samp_m, 4).alias("sample_mean"),
        F.round(F.abs(samp_m - true_m), 4).alias("actual_error"),
        F.round(eps, 4).alias("hoeffding_eps"),
        (F.abs(samp_m - true_m) <= eps).alias("within_bound"),
    )


# ===========================================================================
# R426 — McNemar paired test (Markov vs majority)
# ===========================================================================

_SQL_MC_TRANS = """
    SELECT user_id, event_type AS cur,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events
"""


@register(
    "q_mcnemar",
    f"""
    WITH trans AS ({_SQL_MC_TRANS}),
    clean AS (SELECT * FROM trans WHERE nxt IS NOT NULL),
    train AS (SELECT * FROM clean WHERE user_id % 2 = 1),
    test AS (SELECT * FROM clean WHERE user_id % 2 = 0),
    model AS (
      SELECT cur, nxt AS pred FROM (
        SELECT cur, nxt, ROW_NUMBER() OVER (
          PARTITION BY cur ORDER BY COUNT(*) DESC, nxt) AS rk
        FROM train GROUP BY cur, nxt
      ) WHERE rk = 1
    ),
    majority AS (
      SELECT nxt AS pred FROM (
        SELECT nxt, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, nxt) AS rk
        FROM train GROUP BY nxt
      ) WHERE rk = 1
    ),
    paired AS (
      SELECT CASE WHEN test.nxt = model.pred THEN 1 ELSE 0 END AS m_ok,
             CASE WHEN test.nxt = (SELECT pred FROM majority)
                  THEN 1 ELSE 0 END AS j_ok
      FROM test JOIN model ON model.cur = test.cur
    )
    SELECT CAST(SUM(CASE WHEN m_ok = 1 AND j_ok = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS b_markov_only,
           CAST(SUM(CASE WHEN m_ok = 0 AND j_ok = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS c_majority_only,
           round(pow(abs(SUM(CASE WHEN m_ok = 1 AND j_ok = 0
                                  THEN 1 ELSE 0 END)
                         - SUM(CASE WHEN m_ok = 0 AND j_ok = 1
                                    THEN 1 ELSE 0 END)) - 1.0, 2)
                 / nullif(SUM(CASE WHEN m_ok != j_ok THEN 1 ELSE 0 END), 0),
                 4) AS mcnemar_chi2,
           (SUM(CASE WHEN m_ok = 1 AND j_ok = 0 THEN 1 ELSE 0 END)
            > SUM(CASE WHEN m_ok = 0 AND j_ok = 1 THEN 1 ELSE 0 END))
             AS markov_better
    FROM paired
    """,
)
def q_mcnemar(spark, sf_dir):
    """R426 — McNemar's test on the SAME test transitions (the
    q_markov_accuracy split): b = cases only Markov gets right, c =
    cases only the majority baseline gets right; χ² = (|b−c|−1)²/(b+c)
    with continuity correction, on the DISCORDANT pairs only — the
    concordant mass (both right / both wrong) carries no information
    about the difference, which is why the paired test has power an
    unpaired comparison wastes. Integer cells; one window-per-user
    transition build shared with R420."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    train = trans.filter(F.col("user_id") % 2 == 1)
    test = trans.filter(F.col("user_id") % 2 == 0)
    wm = Window.partitionBy("cur").orderBy(F.col("c").desc(), "nxt")
    model = (
        train.groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("cur", F.col("nxt").alias("pred"))
    )
    maj = (
        train.groupBy("nxt")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "nxt")
        .limit(1)
        .select(F.col("nxt").alias("mpred"))
    )
    paired = (
        test.join(F.broadcast(model), "cur")
        .crossJoin(F.broadcast(maj))
        .select(
            F.when(F.col("nxt") == F.col("pred"), 1).otherwise(0).alias(
                "m_ok"
            ),
            F.when(F.col("nxt") == F.col("mpred"), 1).otherwise(0).alias(
                "j_ok"
            ),
        )
    )
    b = F.sum(
        F.when((F.col("m_ok") == 1) & (F.col("j_ok") == 0), 1).otherwise(0)
    )
    c = F.sum(
        F.when((F.col("m_ok") == 0) & (F.col("j_ok") == 1), 1).otherwise(0)
    )
    return paired.agg(
        b.cast("long").alias("b_markov_only"),
        c.cast("long").alias("c_majority_only"),
        F.round(
            F.pow(F.abs(b - c) - 1.0, 2)
            / F.nullif(
                F.sum(
                    F.when(F.col("m_ok") != F.col("j_ok"), 1).otherwise(0)
                ),
                F.lit(0),
            ),
            4,
        ).alias("mcnemar_chi2"),
        (b > c).alias("markov_better"),
    )


# ===========================================================================
# R427 — Cook's distance influence diagnostics
# ===========================================================================

@register(
    "q_cooks_distance",
    f"""
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
      SELECT n,
             (sxy - sx * 1.0 * sy / n) / (sxx - sx * 1.0 * sx / n)
               AS slope,
             sy * 1.0 / n
               - (sxy - sx * 1.0 * sy / n) / (sxx - sx * 1.0 * sx / n)
                 * (sx * 1.0 / n) AS b0,
             sx * 1.0 / n AS xbar,
             sxx - sx * 1.0 * sx / n AS sxx_c
      FROM reg
    ),
    diag AS (
      SELECT daily.d,
             daily.c - (fit.b0 + fit.slope * daily.d) AS e,
             1.0 / fit.n + (daily.d - fit.xbar) * (daily.d - fit.xbar)
               / fit.sxx_c AS h,
             fit.n
      FROM daily CROSS JOIN fit
    ),
    s2 AS (
      SELECT SUM(e * e) / (MAX(n) - 2) AS s2 FROM diag
    )
    SELECT diag.d AS day,
           round(diag.e, 4) AS residual,
           round(diag.h, 6) AS leverage,
           round(diag.e * diag.e * diag.h
                 / (2.0 * s2.s2 * (1.0 - diag.h) * (1.0 - diag.h)), 6)
             AS cooks_d
    FROM diag CROSS JOIN s2
    ORDER BY cooks_d DESC, day
    LIMIT {_CD_TOP}
    """,
)
def q_cooks_distance(spark, sf_dir):
    """R427 — Cook's distance for the daily trend fit: leverage
    hᵢ = 1/n + (xᵢ−x̄)²/S_xx and Dᵢ = eᵢ²hᵢ/(p·s²(1−hᵢ)²) with p=2 —
    all from the exact integer regression sums (residuals and
    leverages are deterministic doubles). The top-{t} most influential
    days: a big Dᵢ says the slope is one observation's opinion —
    delete-one influence WITHOUT refitting n times (the closed form
    is the whole point). Completes the regression-diagnostics pair
    with q_durbin_watson.""".format(t=_CD_TOP)
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
    fit = reg.select(
        F.col("n"),
        slope.alias("slope"),
        (
            F.col("sy") * 1.0 / F.col("n")
            - slope * (F.col("sx") * 1.0 / F.col("n"))
        ).alias("b0"),
        (F.col("sx") * 1.0 / F.col("n")).alias("xbar"),
        (
            F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n")
        ).alias("sxx_c"),
    )
    diag = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        (F.col("c") - (F.col("b0") + F.col("slope") * F.col("d"))).alias(
            "e"
        ),
        (
            1.0 / F.col("n")
            + (F.col("d") - F.col("xbar"))
            * (F.col("d") - F.col("xbar"))
            / F.col("sxx_c")
        ).alias("h"),
        "n",
    )
    s2 = diag.agg(
        (F.sum(F.col("e") * F.col("e")) / (F.max("n") - 2)).alias("s2")
    )
    return (
        diag.crossJoin(F.broadcast(s2))
        .select(
            F.col("d").alias("day"),
            F.round("e", 4).alias("residual"),
            F.round("h", 6).alias("leverage"),
            F.round(
                F.col("e")
                * F.col("e")
                * F.col("h")
                / (
                    2.0
                    * F.col("s2")
                    * (1.0 - F.col("h"))
                    * (1.0 - F.col("h"))
                ),
                6,
            ).alias("cooks_d"),
        )
        .orderBy(F.col("cooks_d").desc(), "day")
        .limit(_CD_TOP)
    )
