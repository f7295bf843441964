"""Round-4 registry additions, batch 96 — robust trends, multiplicity
correction, and conformal intervals:

- q_theil_sen: Theil–Sen robust trend per event type — the (lower)
  median of all pairwise daily-volume slopes. Robust to outliers where
  OLS (R181) is not; the pair frame is per-type C(days,2) — bounded.
- q_bh_fdr: Benjamini–Hochberg FDR correction over the per-type
  conversion-rate z-tests — the multiplicity control the testing suite
  (z/t/ANOVA/KS/MW/χ²) lacked. Normal CDF via the Abramowitz–Stegun
  7.1.26 erf polynomial — pure arithmetic, identical on both engines
  (neither exposes erf to SQL).
- q_conformal: split conformal prediction — calibration-half mean as
  the point predictor, q̂ = the ⌈(n+1)(1−α)⌉-th smallest absolute
  residual by EXACT rank, empirical coverage on the held-out half.
  Finite-sample validity with no distributional assumption — the
  modern uncertainty wrapper for any point model.

At 100 TB: all three partition by event type (bounded keys); conformal
is two passes (calibration stats broadcast to the test half).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_theil_sen",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.event_type,
             (b.n - a.n) * 1.0
               / CAST(b.day - a.day AS BIGINT) AS slope,
             a.day AS d1, b.day AS d2
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day > a.day
    ),
    ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope, d1, d2) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM pairs
    )
    SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
           ROUND(slope, 6) AS ts_slope
    FROM ranked WHERE rn = (m + 1) // 2
    """,
)
def q_theil_sen(spark, sf_dir):
    """Theil–Sen slope: lower median of pairwise slopes (exact-rank
    selection, deterministic (slope, d1, d2) order). Slopes are single
    int/int divisions — bit-identical cross-engine, so the rank order
    needs no rounding."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("n").alias("n1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("n").alias("n2"))
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("d2") > F.col("d1"))
        .select(
            "event_type",
            (
                (F.col("n2") - F.col("n1"))
                / F.datediff("d2", "d1").cast("long")
            ).alias("slope"),
            "d1", "d2",
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wm = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type", "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    return ranked.filter(
        F.col("rn") == F.floor((F.col("m") + 1) / 2)
    ).select(
        "event_type",
        F.col("m").alias("n_pairs"),
        F.round("slope", 6).alias("ts_slope"),
    )


_ALPHA_FDR = 0.1

# Abramowitz–Stegun 7.1.26 erf approximation (|error| < 1.5e-7), as a
# pure-arithmetic SQL fragment over a non-negative argument {x}
def _sql_erf(x: str) -> str:
    return f"""
    (1 - (((((1.061405429 * (1/(1+0.3275911*{x})) - 1.453152027)
        * (1/(1+0.3275911*{x})) + 1.421413741)
        * (1/(1+0.3275911*{x})) - 0.284496736)
        * (1/(1+0.3275911*{x})) + 0.254829592)
        * (1/(1+0.3275911*{x}))) * exp(-({x})*({x})))
    """


def _erf_col(x):
    t = 1 / (1 + 0.3275911 * x)
    poly = (
        (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
         - 0.284496736) * t + 0.254829592
    ) * t
    return 1 - poly * F.exp(-x * x)


@register(
    "q_bh_fdr",
    f"""
    WITH assign AS (
      SELECT event_type, user_id,
             MAX(CASE WHEN value > 90 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2
    ),
    grp AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS k
      FROM assign GROUP BY 1
    ),
    pool AS (SELECT SUM(k) * 1.0 / SUM(n) AS p0, SUM(n) AS nt FROM grp),
    z AS (
      SELECT g.event_type, g.n, g.k,
             abs((g.k * 1.0 / g.n - p.p0)
                 / sqrt(p.p0 * (1 - p.p0) * (1.0 / g.n))) AS az
      FROM grp g CROSS JOIN pool p
    ),
    pv AS (
      SELECT event_type, n, k,
             2 * (1 - 0.5 * (1 + {_sql_erf('(az / sqrt(2.0))')})) AS p
      FROM z
    ),
    ranked AS (
      SELECT event_type, n, k, p,
             row_number() OVER (ORDER BY p, event_type) AS rnk,
             COUNT(*) OVER () AS m
      FROM pv
    ),
    kstar AS (
      SELECT coalesce(MAX(rnk), 0) AS ks FROM ranked
      WHERE p <= rnk * {_ALPHA_FDR} / m
    )
    SELECT event_type, ROUND(p, 8) AS p_value,
           CAST(rnk AS BIGINT) AS rank,
           ROUND(rnk * {_ALPHA_FDR} / m, 8) AS bh_threshold,
           rnk <= (SELECT ks FROM kstar) AS discovered
    FROM ranked
    """,
)
def q_bh_fdr(spark, sf_dir):
    """BH step-up FDR: per-type conversion-rate one-sample z vs the
    pooled rate, p = 2(1−Φ(|z|)) with Φ from the A&S erf polynomial
    (identical arithmetic both engines), rank p ascending, discover
    every rank ≤ k* = max{{k : p_k ≤ kα/m}}. The ranking window runs
    over m = |event types| rows — bounded."""
    ev = read_events(spark, sf_dir)
    assign = ev.groupBy("event_type", "user_id").agg(
        F.max(F.when(F.col("value") > 90, 1).otherwise(0)).alias("conv")
    )
    grp = assign.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    pool = grp.agg(
        (F.sum("k") / F.sum("n")).alias("p0")
    )
    z = grp.crossJoin(F.broadcast(pool)).select(
        "event_type", "n", "k",
        F.abs(
            (F.col("k") / F.col("n") - F.col("p0"))
            / F.sqrt(F.col("p0") * (1 - F.col("p0")) * (1.0 / F.col("n")))
        ).alias("az"),
    )
    pv = z.select(
        "event_type", "n", "k",
        (2 * (1 - 0.5 * (1 + _erf_col(F.col("az") / F.sqrt(F.lit(2.0)))))).alias(
            "p"
        ),
    )
    w = Window.orderBy("p", "event_type")
    ranked = pv.select(
        "event_type", "p",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    kstar = ranked.filter(
        F.col("p") <= F.col("rnk") * _ALPHA_FDR / F.col("m")
    ).agg(F.coalesce(F.max("rnk"), F.lit(0)).alias("ks"))
    return ranked.crossJoin(F.broadcast(kstar)).select(
        "event_type",
        F.round("p", 8).alias("p_value"),
        F.col("rnk").cast("long").alias("rank"),
        F.round(F.col("rnk") * _ALPHA_FDR / F.col("m"), 8).alias(
            "bh_threshold"
        ),
        (F.col("rnk") <= F.col("ks")).alias("discovered"),
    )


_ALPHA_CP = 0.1


@register(
    "q_conformal",
    f"""
    WITH bounds AS (
      SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2
               AS mid
      FROM events
    ),
    cal AS (
      SELECT event_type, value FROM events
      WHERE epoch_us(ts) < (SELECT mid FROM bounds)
    ),
    tst AS (
      SELECT event_type, value FROM events
      WHERE epoch_us(ts) >= (SELECT mid FROM bounds)
    ),
    model AS (
      SELECT event_type, AVG(value) AS mu,
             CAST(COUNT(*) AS BIGINT) AS n_cal
      FROM cal GROUP BY 1
    ),
    resid AS (
      SELECT c.event_type, abs(c.value - m.mu) AS r, m.n_cal
      FROM cal c JOIN model m ON m.event_type = c.event_type
    ),
    qhat AS (
      SELECT event_type, n_cal, r AS q_hat FROM (
        SELECT event_type, n_cal, r,
               row_number() OVER (PARTITION BY event_type ORDER BY r) AS rn
        FROM resid
      ) WHERE rn = LEAST(CAST(ceil((n_cal + 1) * (1 - {_ALPHA_CP})) AS BIGINT),
                         n_cal)
    )
    SELECT q.event_type, q.n_cal, ROUND(q.q_hat, 4) AS q_hat,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(AVG(CASE WHEN abs(t.value - m.mu) <= q.q_hat
                          THEN 1.0 ELSE 0.0 END), 4) AS coverage
    FROM tst t
    JOIN model m ON m.event_type = t.event_type
    JOIN qhat q ON q.event_type = t.event_type
    GROUP BY q.event_type, q.n_cal, q.q_hat
    """,
)
def q_conformal(spark, sf_dir):
    """Split conformal: time-split halves, per-type calibration mean as
    the predictor, q̂ the exact-rank ⌈(n+1)(1−α)⌉ smallest absolute
    residual (capped at n_cal), empirical coverage of μ ± q̂ on the
    test half — the finite-sample ≥1−α guarantee, assumption-free.
    Residual ranking partitions by type; the model frame broadcasts."""
    ev = read_events(spark, sf_dir)
    b = ev.agg(
        F.min("ts").cast("long").alias("lo"),
        F.max("ts").cast("long").alias("hi"),
    ).select((F.col("lo") + F.floor((F.col("hi") - F.col("lo")) / 2)).alias("mid"))
    evb = ev.crossJoin(F.broadcast(b))
    cal = evb.filter(F.col("ts").cast("long") < F.col("mid")).select(
        "event_type", "value"
    )
    tst = evb.filter(F.col("ts").cast("long") >= F.col("mid")).select(
        "event_type", "value"
    )
    model = cal.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.count(F.lit(1)).alias("n_cal")
    )
    resid = cal.join(model, "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("mu")).alias("r"), "n_cal"
    )
    w = Window.partitionBy("event_type").orderBy("r")
    qhat = (
        resid.withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            == F.least(
                F.ceil((F.col("n_cal") + 1) * (1 - _ALPHA_CP)).cast("long"),
                F.col("n_cal"),
            )
        )
        .select("event_type", F.col("r").alias("q_hat"))
    )
    return (
        tst.join(model, "event_type")
        .join(qhat, "event_type")
        .groupBy("event_type", "n_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(
                F.avg(
                    F.when(
                        F.abs(F.col("value") - F.col("mu")) <= F.col("q_hat"),
                        1.0,
                    ).otherwise(0.0)
                ),
                4,
            ).alias("coverage"),
        )
        .select(
            "event_type", "n_cal",
            F.round("q_hat", 4).alias("q_hat"),
            "n_test", "coverage",
        )
    )
