"""Round-2 registry additions, batch 34 — change detection, nonparametric
testing, and inequality curves:

- q_cusum_changepoint: CUSUM scan over the daily event series — the
  change-point detector (argmax of cumulative deviation from the mean);
- q_mann_whitney: Mann-Whitney U rank-sum test between experiment arms
  — the nonparametric companion of q_ab_test (valid under the heavy
  tails q_hill_tail_index measures);
- q_lorenz: Lorenz curve of per-user spend in deciles — the cumulative
  curve whose area defect q_gini summarizes.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# CUSUM change point
# ===========================================================================

@register(
    "q_cusum_changepoint",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*) AS n
      FROM events GROUP BY 1
    ),
    m AS (SELECT AVG(n) AS mu, COUNT(*) AS n_days FROM daily),
    c AS (
      SELECT d, n,
             round(SUM(n - mu) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               + 0.0 AS cusum
      FROM daily CROSS JOIN m
    )
    SELECT epoch_us(d) AS day_us, n, cusum,
           CAST(abs(cusum) = (SELECT MAX(abs(cusum)) FROM c) AS INTEGER)
             AS is_changepoint
    FROM c
    """,
)
def q_cusum_changepoint(spark, sf_dir):
    """Time series — CUSUM change-point scan: the running sum of daily
    deviations from the global mean; its |max| marks the most likely
    regime change (the classic offline CUSUM argmax). The series is
    |days| rows after one partial agg, so the ordered window runs on a
    calendar-bounded table (the q_daily_anomaly precedent — this is
    never an event-stream window). Cusum rounds to 6 (mu is an
    engine-summed average) and adds +0.0 so the ~zero final row cannot
    split into -0.0 vs 0.0 across engines."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = daily.agg(F.avg("n").alias("mu"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.crossJoin(F.broadcast(m)).select(
        "d", "n",
        (F.round(F.sum(F.col("n") - F.col("mu")).over(w), 6) + F.lit(0.0)).alias("cusum"),
    )
    mx = c.agg(F.max(F.abs(F.col("cusum"))).alias("mx"))
    return c.crossJoin(F.broadcast(mx)).select(
        F.unix_micros("d").alias("day_us"), "n", "cusum",
        (F.abs(F.col("cusum")) == F.col("mx")).cast("int").alias("is_changepoint"),
    )


# ===========================================================================
# Mann-Whitney U
# ===========================================================================

@register(
    "q_mann_whitney",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm, round(SUM(value), 4) AS spend
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    ranked AS (
      SELECT arm, spend,
             RANK() OVER (ORDER BY spend) AS rk,
             COUNT(*) OVER (PARTITION BY spend) AS ties
      FROM per_user
    ),
    mid AS (
      SELECT arm, rk + (ties - 1) / 2.0 AS midrank FROM ranked
    ),
    agg AS (
      SELECT
        SUM(CASE WHEN arm = 1 THEN midrank END) AS r1,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0
      FROM mid
    )
    SELECT n0, n1,
           round(r1 - n1 * (n1 + 1) / 2.0, 4) AS u1,
           round((r1 - n1 * (n1 + 1) / 2.0 - n0 * n1 / 2.0)
                 / sqrt(n0 * n1 * (n0 + n1 + 1) / 12.0), 6) AS z
    FROM agg
    """,
)
def q_mann_whitney(spark, sf_dir):
    """Experimentation — Mann-Whitney U rank-sum test on per-user spend
    between the deterministic arms: midranks (average rank over ties),
    U₁ = R₁ − n₁(n₁+1)/2, normal-approximation z (no tie correction in
    the variance — both engines identically). Valid under the heavy
    tails that break the t/z-test (q_ab_test) — the nonparametric half
    of the experimentation pair. Stream collapses to |users| rows, then
    to |distinct spends| GROUPS whose midranks come from a distributed
    zip_scan running count (the q_auc construction — every term a
    half-integer, so the group-factored R₁ is bit-equal to the SQL
    twin's row-level rank window); spend pre-rounds to 4 so ranks are
    engine-exact."""
    from arrow_supercluster_spark.functions.distrank import zip_scan

    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(F.round(F.sum("value"), 4).alias("spend"))
    groups = per_user.groupBy("spend").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1g"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0g"),
    )
    g, _, _ = zip_scan(groups, ["spend"], out="_i", scan_col="cnt",
                       scan_out="_c")
    midrank = F.col("_c") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
    agg = g.agg(
        F.sum(F.col("n1g") * midrank).alias("r1"),
        F.sum("n1g").alias("n1"),
        F.sum("n0g").alias("n0"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    z = (u1 - F.col("n0") * F.col("n1") / 2.0) / F.sqrt(
        F.col("n0") * F.col("n1") * (F.col("n0") + F.col("n1") + 1) / 12.0
    )
    return agg.select(
        "n0", "n1",
        F.round(u1, 4).alias("u1"),
        F.round(z, 6).alias("z"),
    )


# ===========================================================================
# Lorenz curve
# ===========================================================================

@register(
    "q_lorenz",
    """
    WITH per_user AS (
      SELECT user_id, round(SUM(value), 4) AS spend
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    ranked AS (
      SELECT spend,
             ROW_NUMBER() OVER (ORDER BY spend, user_id) AS rk,
             COUNT(*) OVER () AS n,
             SUM(spend) OVER () AS tot
      FROM per_user
    ),
    cum AS (
      SELECT CAST(ceil(rk * 10.0 / n) AS INTEGER) AS decile,
             rk, n, tot,
             SUM(spend) OVER (ORDER BY rk) AS cum_spend
      FROM ranked
    )
    SELECT decile,
           round(MAX(rk) * 1.0 / ANY_VALUE(n), 6) AS pop_share,
           round(MAX(cum_spend) / ANY_VALUE(tot), 6) AS spend_share
    FROM cum GROUP BY decile
    """,
)
def q_lorenz(spark, sf_dir):
    """Inequality — Lorenz curve of per-user spend in deciles:
    cumulative population share vs cumulative spend share, sorted
    ascending (the curve whose area defect is q_gini). The stream
    collapses to |users| rows; rank, total and running sum all come from
    one distributed zip_scan pass (functions/distrank.py, VERDICT r3
    de-weak — no |users| global window) with (spend, user_id)
    determinism; ten output points, rounded at 6 far above the scan's
    partition-boundary float residual."""
    from arrow_supercluster_spark.functions.distrank import zip_scan

    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("spend")
    )
    ranked, n, tot = zip_scan(
        per_user, ["spend", "user_id"], out="_idx",
        scan_col="spend", scan_out="cum_spend",
    )
    cum = ranked.select(
        F.ceil((F.col("_idx") + 1) * 10.0 / F.lit(n)).cast("int")
        .alias("decile"),
        (F.col("_idx") + 1).alias("rk"),
        "cum_spend",
    )
    return cum.groupBy("decile").agg(
        F.round(F.max("rk") * 1.0 / F.lit(n), 6).alias("pop_share"),
        F.round(F.max("cum_spend") / F.lit(tot), 6).alias("spend_share"),
    )
