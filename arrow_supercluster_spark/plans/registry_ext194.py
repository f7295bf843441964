"""Round-7 registry additions, batch 189 — causal-inference
completions (uplift targeting, instrumental variables, regression
discontinuity):

- q_qini_uplift: the uplift-model evaluation curve — users ranked by a
  stated pre-period engagement score into NTILE(10) deciles (distributed
  zip_scan rank + closed-form NTILE, the q_rfm_segments pattern), per
  decile the treatment/control conversion split and incremental uplift,
  plus the cumulative Qini statistic Y_t(k) − Y_c(k)·N_t(k)/N_c(k).
- q_wald_iv: the Wald/LATE estimator of an encouragement design — a
  user-hash instrument, a STATED compliance rule (d = z XOR
  [signup_count divisible by 5] — compliers are the non-divisible
  users), purchase spend as outcome: ITT, first stage, and their ratio.
- q_rdd_estimator: sharp regression discontinuity at the noon cutoff of
  the minute-of-day running variable (bandwidth 240 min): local-linear
  fits on both sides from exact integer sums, effect = ŷ_R(720) −
  ŷ_L(720) — the design q_ips_estimator's hour-of-day policy motivates.

At 100 TB: all three collapse the corpus once on user_id (or to the
2×6 side/sum frame for RDD); the decile machinery runs on the
|users|-sized frame through the distributed rank (no global window),
and every statistic folds from exact integer sums (counts, cents,
minute products), so both engines divide identical integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_P = 2147483647
_QU_SPLIT = "2024-01-22"
_QU_CONV_MIN = 300.0
_QU_DECILES = 10
_RDD_CUT, _RDD_BW = 720, 240


# ===========================================================================
# R563 — Qini uplift curve over score deciles
# ===========================================================================

_QU_PER_USER_SQL = f"""
      SELECT user_id, user_id % 2 AS t,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '{_QU_SPLIT}'
                            AND event_type IN ('click', 'view')
                           THEN 1 ELSE 0 END) AS BIGINT) AS score,
             MAX(CASE WHEN ts >= TIMESTAMP '{_QU_SPLIT}'
                       AND event_type = 'purchase'
                       AND value > {_QU_CONV_MIN}
                      THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY 1
"""


@register(
    "q_qini_uplift",
    f"""
    WITH per_user AS ({_QU_PER_USER_SQL}),
    dec AS (
      SELECT t, y,
             NTILE({_QU_DECILES}) OVER (ORDER BY score DESC, user_id)
               AS decile
      FROM per_user
    ),
    g AS (
      SELECT decile,
             CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS y_t,
             CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS y_c
      FROM dec GROUP BY 1
    )
    SELECT a.decile,
           MAX(CASE WHEN b.decile = a.decile THEN b.n_t END) AS n_t,
           MAX(CASE WHEN b.decile = a.decile THEN b.n_c END) AS n_c,
           MAX(CASE WHEN b.decile = a.decile THEN b.y_t END) AS conv_t,
           MAX(CASE WHEN b.decile = a.decile THEN b.y_c END) AS conv_c,
           round(MAX(CASE WHEN b.decile = a.decile
                 THEN CAST(b.y_t AS DOUBLE) / NULLIF(b.n_t, 0)
                    - CAST(b.y_c AS DOUBLE) / NULLIF(b.n_c, 0) END), 6)
             AS uplift,
           round(SUM(b.y_t)
                 - CAST(SUM(b.y_c) AS DOUBLE) * SUM(b.n_t)
                   / NULLIF(SUM(b.n_c), 0), 6) AS cum_qini
    FROM g a JOIN g b ON b.decile <= a.decile
    GROUP BY a.decile
    ORDER BY a.decile
    """,
)
def q_qini_uplift(spark, sf_dir):
    """R563 — uplift deciles: score = pre-split (Jan 22) click/view count,
    outcome = post-split high-value purchase bit, treatment = user parity.  The
    user rank is a distributed zip_scan + closed-form NTILE (identical
    boundaries to the twin's NTILE); the cumulative Qini runs on the
    10-row decile frame via a bounded self-join."""
    from arrow_supercluster_spark.functions.distrank import (
        ntile_bucket,
        zip_scan,
    )

    ev = read_events(spark, sf_dir)
    split = F.lit(_QU_SPLIT).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("ts") < split)
                & F.col("event_type").isin("click", "view"),
                1,
            ).otherwise(0)
        ).alias("score"),
        F.max(
            F.when(
                (F.col("ts") >= split)
                & (F.col("event_type") == "purchase")
                & (F.col("value") > _QU_CONV_MIN),
                1,
            ).otherwise(0)
        ).alias("y"),
    )
    ranked, n, _ = zip_scan(
        per_user, [F.col("score").desc(), "user_id"], out="_rk"
    )
    dec = ranked.select(
        F.pmod("user_id", F.lit(2)).alias("t"),
        "y",
        ntile_bucket(F.col("_rk"), n, _QU_DECILES).alias("decile"),
    )
    g = dec.groupBy("decile").agg(
        F.sum(F.when(F.col("t") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("t") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0)).alias(
            "y_t"
        ),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0)).alias(
            "y_c"
        ),
    )
    b = g.select(*[F.col(c).alias(f"b_{c}") for c in g.columns])
    return (
        g.join(F.broadcast(b), F.col("b_decile") <= F.col("decile"))
        .groupBy("decile", "n_t", "n_c", "y_t", "y_c")
        .agg(
            F.sum("b_y_t").alias("cy_t"),
            F.sum("b_y_c").alias("cy_c"),
            F.sum("b_n_t").alias("cn_t"),
            F.sum("b_n_c").alias("cn_c"),
        )
        .select(
            "decile",
            "n_t",
            "n_c",
            F.col("y_t").alias("conv_t"),
            F.col("y_c").alias("conv_c"),
            F.round(
                F.col("y_t").cast("double")
                / F.nullif(F.col("n_t"), F.lit(0))
                - F.col("y_c").cast("double")
                / F.nullif(F.col("n_c"), F.lit(0)),
                6,
            ).alias("uplift"),
            F.round(
                F.col("cy_t")
                - F.col("cy_c").cast("double")
                * F.col("cn_t")
                / F.nullif(F.col("cn_c"), F.lit(0)),
                6,
            ).alias("cum_qini"),
        )
        .orderBy("decile")
    )


# ===========================================================================
# R564 — Wald instrumental-variable (LATE) estimator
# ===========================================================================

@register(
    "q_wald_iv",
    f"""
    WITH pu AS (
      SELECT user_id,
             (user_id * 2654435761 % {_P}) % 2 AS z,
             CAST(SUM(CASE WHEN event_type = 'signup'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y_cents
      FROM events GROUP BY 1
    ),
    dosed AS (
      SELECT z, y_cents,
             CASE WHEN (n_signup % 5 = 0) THEN 1 - z ELSE z END AS d
      FROM pu
    ),
    g AS (
      SELECT z, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS nd,
             CAST(SUM(y_cents) AS BIGINT) AS sy
      FROM dosed GROUP BY 1
    ),
    piv AS (
      SELECT MAX(CASE WHEN z = 0 THEN n END) AS n0,
             MAX(CASE WHEN z = 1 THEN n END) AS n1,
             MAX(CASE WHEN z = 0 THEN nd END) AS nd0,
             MAX(CASE WHEN z = 1 THEN nd END) AS nd1,
             MAX(CASE WHEN z = 0 THEN sy END) AS sy0,
             MAX(CASE WHEN z = 1 THEN sy END) AS sy1
      FROM g
    )
    SELECT n0, n1,
           round((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
                 / 100.0, 6) AS itt,
           round(CAST(nd1 AS DOUBLE) / n1 - CAST(nd0 AS DOUBLE) / n0, 6)
             AS first_stage,
           round(((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0)
                  / 100.0)
                 / NULLIF(CAST(nd1 AS DOUBLE) / n1
                          - CAST(nd0 AS DOUBLE) / n0, 0.0), 6) AS wald
    FROM piv
    """,
)
def q_wald_iv(spark, sf_dir):
    """R564 — Wald = ITT / first-stage: instrument z = affine user
    hash bit; treatment d follows the stated compliance rule d = z
    XOR [signup-count divisible by 5] (≈80% compliers); outcome =
    total purchase spend.  One user collapse, then a 2-row fold."""
    ev = read_events(spark, sf_dir)
    pu = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("n_signup"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(0)
        ).alias("y_cents"),
    )
    z = F.pmod(F.col("user_id") * 2654435761, F.lit(_P)) % 2
    dosed = pu.select(
        z.alias("z"),
        "y_cents",
        F.when(F.pmod("n_signup", F.lit(5)) == 0, 1 - z)
        .otherwise(z)
        .alias("d"),
    )
    g = dosed.groupBy("z").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("nd"),
        F.sum("y_cents").alias("sy"),
    )
    piv = g.agg(
        *[
            F.max(F.when(F.col("z") == zz, F.col(c))).alias(f"{c}{zz}")
            for zz in (0, 1)
            for c in ("n", "nd", "sy")
        ]
    )
    itt = (
        F.col("sy1").cast("double") / F.col("n1")
        - F.col("sy0").cast("double") / F.col("n0")
    ) / 100.0
    fs = F.col("nd1").cast("double") / F.col("n1") - F.col("nd0").cast(
        "double"
    ) / F.col("n0")
    return piv.select(
        "n0",
        "n1",
        F.round(itt, 6).alias("itt"),
        F.round(fs, 6).alias("first_stage"),
        F.round(itt / F.nullif(fs, F.lit(0.0)), 6).alias("wald"),
    )


# ===========================================================================
# R565 — sharp regression discontinuity at the noon cutoff
# ===========================================================================

@register(
    "q_rdd_estimator",
    f"""
    WITH pts AS (
      SELECT EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
      WHERE abs(EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)
                - {_RDD_CUT}) < {_RDD_BW}
    ),
    sides AS (
      SELECT CASE WHEN x >= {_RDD_CUT} THEN 1 ELSE 0 END AS side,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pts GROUP BY 1
    ),
    fits AS (
      SELECT side, n,
             (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS slope,
             sx, sy
      FROM sides
    ),
    at_cut AS (
      SELECT side, n, slope,
             (CAST(sy AS DOUBLE)
              + slope * ({_RDD_CUT} * CAST(n AS DOUBLE) - sx)) / n
               AS yhat_cents
      FROM fits
    ),
    piv AS (
      SELECT MAX(CASE WHEN side = 0 THEN n END) AS n_l,
             MAX(CASE WHEN side = 1 THEN n END) AS n_r,
             MAX(CASE WHEN side = 0 THEN slope END) AS slope_l,
             MAX(CASE WHEN side = 1 THEN slope END) AS slope_r,
             MAX(CASE WHEN side = 0 THEN yhat_cents END) AS yl,
             MAX(CASE WHEN side = 1 THEN yhat_cents END) AS yr
      FROM at_cut
    )
    SELECT n_l, n_r,
           round(yl / 100.0, 4) AS yhat_left,
           round(yr / 100.0, 4) AS yhat_right,
           round(slope_l, 6) AS slope_left,
           round(slope_r, 6) AS slope_right,
           round((yr - yl) / 100.0, 4) AS effect
    FROM piv
    """,
)
def q_rdd_estimator(spark, sf_dir):
    """R565 — sharp RDD: running variable = minute-of-day, cutoff 720
    (the q_ips_estimator policy switch), bandwidth ±240; separate
    local-linear OLS per side from five exact integer sums, effect =
    jump of the fitted value at the cutoff."""
    ev = read_events(spark, sf_dir)
    x = F.hour("ts") * 60 + F.minute("ts")
    pts = ev.select(
        x.alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    ).filter(F.abs(F.col("x") - _RDD_CUT) < _RDD_BW)
    sides = pts.groupBy(
        F.when(F.col("x") >= _RDD_CUT, 1).otherwise(0).alias("side")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (
        F.col("n").cast("double") * F.col("sxy")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n").cast("double") * F.col("sxx")
        - F.col("sx").cast("double") * F.col("sx")
    )
    at_cut = sides.withColumn("slope", slope).withColumn(
        "yhat_cents",
        (
            F.col("sy").cast("double")
            + F.col("slope")
            * (_RDD_CUT * F.col("n").cast("double") - F.col("sx"))
        )
        / F.col("n"),
    )
    piv = at_cut.agg(
        F.max(F.when(F.col("side") == 0, F.col("n"))).alias("n_l"),
        F.max(F.when(F.col("side") == 1, F.col("n"))).alias("n_r"),
        F.max(F.when(F.col("side") == 0, F.col("slope"))).alias(
            "slope_l"
        ),
        F.max(F.when(F.col("side") == 1, F.col("slope"))).alias(
            "slope_r"
        ),
        F.max(F.when(F.col("side") == 0, F.col("yhat_cents"))).alias(
            "yl"
        ),
        F.max(F.when(F.col("side") == 1, F.col("yhat_cents"))).alias(
            "yr"
        ),
    )
    return piv.select(
        "n_l",
        "n_r",
        F.round(F.col("yl") / 100.0, 4).alias("yhat_left"),
        F.round(F.col("yr") / 100.0, 4).alias("yhat_right"),
        F.round("slope_l", 6).alias("slope_left"),
        F.round("slope_r", 6).alias("slope_right"),
        F.round((F.col("yr") - F.col("yl")) / 100.0, 4).alias("effect"),
    )
