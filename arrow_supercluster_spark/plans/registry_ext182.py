"""Round-7 registry additions, batch 177 — robust monitoring
statistics (the estimators a pipeline health dashboard runs when the
metric distributions are heavy-tailed or drifting):

- q_median_of_means: the MoM robust mean of event value per event
  type — values hash into k=16 deterministic buckets (event_id % k),
  bucket means collapse distributed, the median of the 16 means is
  exact (avg of the two middle order statistics).  MoM is THE
  estimator built for distributed execution: sub-Gaussian deviation
  bounds under only a finite variance, and the expensive part is a
  partial-aggregated two-key groupBy.
- q_trimmed_mean: 10–90% interquantile mean per event type — mean of
  the integer-cent values between the exact linear-interpolated
  deciles (Spark `percentile` ≡ DuckDB `quantile_cont`, the
  q_len_percentiles discipline).  The outlier-insensitive center the
  raw mean cannot give; no per-row ranking, no unique-key total
  order needed.
- q_cox_stuart: Cox-Stuart trend test per event type — pair day i
  with day i + ⌈D/2⌉ over the daily count series, count
  positive/negative signs (ties dropped), normal-approx z on the
  sign counts.  The distribution-free "is this metric trending"
  check behind every drift alert.
- q_bartlett: Bartlett's variance-homogeneity test across the five
  event types on integer cents — the parametric sibling of the
  registered Brown-Forsythe q_levene (more powerful under
  near-normality, the classic pre-ANOVA check).  Closed form from
  per-group (n, Σc, Σc²) BIGINT sums, so both engines feed ln()
  bit-identical ratios.

At 100 TB: every query collapses the corpus in ONE partial-aggregated
pass (MoM: 5×16 keys; trimmed mean: one percentile + one filtered
mean per 5 keys; Cox-Stuart: ≤31 day rows per type then a self-join
on the bounded day-rank frame; Bartlett: 5 scalar triples).  No
windows over unbounded frames, no collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_MOM_K = 16
_TM_LO, _TM_HI = 0.1, 0.9
_BARTLETT_CRIT = 9.488  # chi2(k-1=4) at 5% — stated constant


# ===========================================================================
# R531 — median of means
# ===========================================================================

@register(
    "q_median_of_means",
    f"""
    WITH b AS (
      SELECT event_type, event_id % {_MOM_K} AS bucket,
             AVG(value) AS mu, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, mu,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY mu, bucket) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS k
      FROM b
    )
    SELECT event_type,
           CAST((SELECT SUM(n) FROM b b2
                 WHERE b2.event_type = ranked.event_type) AS BIGINT)
             AS n_events,
           CAST(MAX(k) AS BIGINT) AS k_buckets,
           round(AVG(CASE WHEN rk IN ((k + 1) // 2, (k + 2) // 2)
                          THEN mu END), 6) AS mom,
           round((SELECT SUM(mu * n) / SUM(n) FROM b b3
                  WHERE b3.event_type = ranked.event_type), 6)
             AS plain_mean
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
)
def q_median_of_means(spark, sf_dir):
    """R531 — median-of-means per event type: event_id % 16 buckets,
    distributed bucket means, exact median of the 16 means (average of
    the two middle order statistics over the BOUNDED bucket frame).
    The plain mean ships alongside so the dashboard sees the
    robust-vs-raw gap.  One (type, bucket) partial aggregate does all
    the corpus work; the median runs on 5×16 rows."""
    ev = read_events(spark, sf_dir)
    b = ev.groupBy(
        "event_type", (F.col("event_id") % _MOM_K).alias("bucket")
    ).agg(F.avg("value").alias("mu"), F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("mu", "bucket")
    wk = Window.partitionBy("event_type")
    ranked = b.select(
        "event_type", "mu", "n",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    mid = F.when(
        (F.col("rk") == F.floor((F.col("k") + 1) / 2))
        | (F.col("rk") == F.floor((F.col("k") + 2) / 2)),
        F.col("mu"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.max("k").alias("k_buckets"),
            F.round(F.avg(mid), 6).alias("mom"),
            F.round(
                F.sum(F.col("mu") * F.col("n")) / F.sum("n"), 6
            ).alias("plain_mean"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R532 — interquantile (trimmed) mean
# ===========================================================================

@register(
    "q_trimmed_mean",
    f"""
    WITH vals AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    cuts AS (
      SELECT event_type,
             quantile_cont(c, {_TM_LO}) AS lo,
             quantile_cont(c, {_TM_HI}) AS hi
      FROM vals GROUP BY 1
    )
    SELECT v.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN v.c >= cuts.lo AND v.c <= cuts.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(AVG(v.c) / 100, 6) AS raw_mean,
           round(SUM(CASE WHEN v.c >= cuts.lo AND v.c <= cuts.hi
                     THEN v.c ELSE 0 END) * 1.0
                 / SUM(CASE WHEN v.c >= cuts.lo AND v.c <= cuts.hi
                       THEN 1 ELSE 0 END) / 100, 6) AS trimmed_mean
    FROM vals v JOIN cuts ON cuts.event_type = v.event_type
    GROUP BY 1 ORDER BY 1
    """,
)
def q_trimmed_mean(spark, sf_dir):
    """R532 — 10–90% interquantile mean per event type on integer
    cents: exact interpolated deciles (Spark `percentile` ≡ DuckDB
    `quantile_cont`) bound the kept mass; the trimmed mean averages
    inside the bounds.  Value thresholds instead of per-row ranks:
    deterministic without a unique-key total order and needs no
    global sort — two partial-aggregated passes."""
    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    cuts = ev.groupBy("event_type").agg(
        F.expr(f"percentile(c, {_TM_LO})").alias("lo"),
        F.expr(f"percentile(c, {_TM_HI})").alias("hi"),
    )
    kept = (F.col("c") >= F.col("lo")) & (F.col("c") <= F.col("hi"))
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.round(F.avg("c") / 100, 6).alias("raw_mean"),
            F.round(
                F.sum(F.when(kept, F.col("c")).otherwise(0))
                * 1.0
                / F.sum(F.when(kept, 1).otherwise(0))
                / 100,
                6,
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R533 — Cox-Stuart trend test
# ===========================================================================

@register(
    "q_cox_stuart",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, n,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY day) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS d
      FROM daily
    ),
    paired AS (
      SELECT a.event_type,
             SIGN(b.n - a.n) AS s
      FROM idx a
      JOIN idx b ON b.event_type = a.event_type
                AND b.rk = a.rk + (a.d + 1) // 2
      WHERE a.rk <= a.d // 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_plus,
           CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_minus,
           round(CASE WHEN SUM(CASE WHEN s <> 0 THEN 1 ELSE 0 END) = 0
                      THEN 0.0
                      ELSE (SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END)
                            - SUM(CASE WHEN s <> 0 THEN 1 ELSE 0 END)
                              / 2.0)
                           / sqrt(SUM(CASE WHEN s <> 0 THEN 1 ELSE 0
                                      END) / 4.0) END, 6) AS z,
           abs(CASE WHEN SUM(CASE WHEN s <> 0 THEN 1 ELSE 0 END) = 0
                    THEN 0.0
                    ELSE (SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END)
                          - SUM(CASE WHEN s <> 0 THEN 1 ELSE 0 END)
                            / 2.0)
                         / sqrt(SUM(CASE WHEN s <> 0 THEN 1 ELSE 0
                                    END) / 4.0) END) > 1.96
             AS trending
    FROM paired GROUP BY 1 ORDER BY 1
    """,
)
def q_cox_stuart(spark, sf_dir):
    """R533 — Cox-Stuart trend test per event type: day i pairs with
    day i + ⌈D/2⌉ on the daily-count series, ties dropped, z =
    (n⁺ − m/2)/√(m/4) over the m non-tied pairs, |z| > 1.96 flags a
    trend.  The corpus collapses once to ≤31 day rows per type; the
    pairing is a self-join on the bounded day-rank frame."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    wd = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type", "n",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wd).alias("d"),
    )
    b = idx.select(
        F.col("event_type").alias("bt"),
        F.col("n").alias("bn"),
        F.col("rk").alias("brk"),
    )
    paired = idx.join(
        b,
        (F.col("bt") == F.col("event_type"))
        & (F.col("brk") == F.col("rk") + F.floor((F.col("d") + 1) / 2)),
    ).filter(F.col("rk") <= F.floor(F.col("d") / 2)).select(
        "event_type", F.signum(F.col("bn") - F.col("n")).alias("s")
    )
    m = F.sum(F.when(F.col("s") != 0, 1).otherwise(0))
    plus = F.sum(F.when(F.col("s") > 0, 1).otherwise(0))
    z = F.when(m == 0, F.lit(0.0)).otherwise(
        (plus - m / 2.0) / F.sqrt(m / 4.0)
    )
    return (
        paired.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            plus.alias("n_plus"),
            F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).alias(
                "n_minus"
            ),
            F.round(z, 6).alias("z"),
            (F.abs(z) > 1.96).alias("trending"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R534 — Bartlett's variance-homogeneity test
# ===========================================================================

@register(
    "q_bartlett",
    f"""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS s1,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS s2
      FROM events GROUP BY 1
    ),
    v AS (
      SELECT event_type, n,
             (s2 - s1 * 1.0 * s1 / n) / (n - 1) AS var
      FROM g
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS nn,
             SUM((n - 1) * var) / SUM(n - 1) AS sp2,
             SUM((n - 1) * ln(var)) AS sum_lnv,
             SUM(1.0 / (n - 1)) AS sum_inv
      FROM v
    )
    SELECT k, nn AS n_total, round(sp2 / 10000, 6) AS pooled_var,
           round(((nn - k) * ln(sp2) - sum_lnv)
                 / (1 + (sum_inv - 1.0 / (nn - k)) / (3 * (k - 1))), 6)
             AS t_stat,
           {_BARTLETT_CRIT} AS crit_5pct,
           ((nn - k) * ln(sp2) - sum_lnv)
           / (1 + (sum_inv - 1.0 / (nn - k)) / (3 * (k - 1)))
           > {_BARTLETT_CRIT} AS reject_equal_var
    FROM agg
    """,
)
def q_bartlett(spark, sf_dir):
    """R534 — Bartlett's test across the five event-type value groups
    on integer cents (pooled_var reported back in value² units):
    T = ((N−k)·ln s_p² − Σ(nᵢ−1)·ln sᵢ²) / C with the standard
    correction C.  Per-group (n, Σc, Σc²) are exact BIGINT sums, so
    both engines hand ln() bit-identical ratios; the parametric
    sibling of the registered Brown-Forsythe q_levene."""
    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    v = g.select(
        "n",
        (
            (F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    agg = v.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        (
            F.sum((F.col("n") - 1) * F.col("var"))
            / F.sum(F.col("n") - 1)
        ).alias("sp2"),
        F.sum((F.col("n") - 1) * F.log(F.col("var"))).alias("sum_lnv"),
        F.sum(1.0 / (F.col("n") - 1)).alias("sum_inv"),
    )
    t = (
        (F.col("nn") - F.col("k")) * F.log(F.col("sp2"))
        - F.col("sum_lnv")
    ) / (
        1
        + (F.col("sum_inv") - 1.0 / (F.col("nn") - F.col("k")))
        / (3 * (F.col("k") - 1))
    )
    return agg.select(
        "k",
        F.col("nn").alias("n_total"),
        F.round(F.col("sp2") / 10000, 6).alias("pooled_var"),
        F.round(t, 6).alias("t_stat"),
        F.lit(_BARTLETT_CRIT).alias("crit_5pct"),
        (t > _BARTLETT_CRIT).alias("reject_equal_var"),
    )
