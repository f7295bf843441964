"""Round-2 registry additions, batch 35 — distribution comparison and
serial/rank dependence:

- q_ks_test: two-sample Kolmogorov-Smirnov D between the experiment
  arms' per-user spend distributions (max ECDF gap);
- q_autocorrelation: lag-1..7 autocorrelation of the daily event count
  series — the serial-dependence profile behind forecasting/anomaly
  thresholds;
- q_spearman: Spearman rank correlation between per-user frequency and
  monetary value — monotone association robust to the heavy tails.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Kolmogorov-Smirnov
# ===========================================================================

@register(
    "q_ks_test",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm, round(SUM(value), 4) AS spend
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    n AS (
      SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1
      FROM per_user
    ),
    steps AS (
      SELECT spend,
             SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) OVER (
               ORDER BY spend ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS c0,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) OVER (
               ORDER BY spend ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS c1
      FROM per_user
    ),
    gaps AS (
      SELECT spend, MAX(c0) AS c0, MAX(c1) AS c1
      FROM steps GROUP BY spend
    )
    SELECT n0, n1,
           round(MAX(abs(c0 * 1.0 / n0 - c1 * 1.0 / n1)), 6) AS d,
           round(MAX(abs(c0 * 1.0 / n0 - c1 * 1.0 / n1))
                 * sqrt(n0 * n1 * 1.0 / (n0 + n1)), 6) AS ks_stat
    FROM gaps CROSS JOIN n
    GROUP BY n0, n1
    """,
)
def q_ks_test(spark, sf_dir):
    """Experimentation — two-sample Kolmogorov-Smirnov: D = max ECDF gap
    between the arms' per-user spend distributions, plus the scaled
    √(n₀n₁/(n₀+n₁))·D statistic — the whole-distribution test
    completing the location pair (q_ab_test parametric, q_mann_whitney
    rank). ECDFs are running counts over the |users|-bounded sorted
    spend (ties collapsed to their last step — the right ECDF value);
    one agg takes the max gap. Spend pre-rounds to 4 so step positions
    are engine-exact."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(F.round(F.sum("value"), 4).alias("spend"))
    n = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
    )
    # group-level running counts via a distributed zip_scan (the SQL
    # twin's gaps CTE already collapses ties to their last step, so the
    # per-group cumulative IS the ECDF value — integer-exact in float64,
    # bit-equal, and no |users| global window)
    from arrow_supercluster_spark.functions.distrank import zip_scan

    per_spend = per_user.groupBy("spend").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("g0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("g1"),
    )
    gaps, _, _ = zip_scan(
        per_spend, ["spend"], out="_i",
        scan_col=["g0", "g1"], scan_out=["c0", "c1"],
    )
    gap = F.abs(F.col("c0") * 1.0 / F.col("n0") - F.col("c1") * 1.0 / F.col("n1"))
    return (
        gaps.crossJoin(F.broadcast(n))
        .groupBy("n0", "n1")
        .agg(
            F.round(F.max(gap), 6).alias("d"),
            F.round(
                F.max(gap)
                * F.sqrt(F.col("n0") * F.col("n1") * 1.0 / (F.col("n0") + F.col("n1"))),
                6,
            ).alias("ks_stat"),
        )
    )


# ===========================================================================
# Autocorrelation function
# ===========================================================================

_ACF_MAX_LAG = 7


@register(
    "q_autocorrelation",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag)
    SELECT l.lag,
           COUNT(*) AS n_pairs,
           round(corr(a.n, b.n), 6) AS acf
    FROM lags l
    JOIN idx a ON TRUE
    JOIN idx b ON b.i = a.i + l.lag
    GROUP BY l.lag
    """,
)
def q_autocorrelation(spark, sf_dir):
    """Time series — autocorrelation function of the daily count series
    at lags 1..{m}: Pearson correlation of the series with its lagged
    self (the sample-ACF variant; the forecasting/seasonality
    diagnostic that justifies q_daily_anomaly's trailing window and
    q_seasonality's weekly grid). The series is |days| rows after one
    partial agg; the lag join is an integer-index equi-join on that
    tiny table; one corr agg per lag.""".format(m=_ACF_MAX_LAG)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    idx = daily.select(
        "n", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = idx.select(F.col("n").alias("an"), F.col("i").alias("ai"))
    b = idx.select(F.col("n").alias("bn"), F.col("i").alias("bi"))
    joined = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("bi") == F.col("ai") + F.col("lag"))
    )
    return joined.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.corr("an", "bn"), 6).alias("acf"),
    )


# ===========================================================================
# Spearman rank correlation
# ===========================================================================

@register(
    "q_spearman",
    """
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS freq, round(SUM(value), 4) AS spend
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    ranked AS (
      SELECT
        RANK() OVER (ORDER BY freq) + (COUNT(*) OVER (PARTITION BY freq) - 1) / 2.0
          AS r_freq,
        RANK() OVER (ORDER BY spend) + (COUNT(*) OVER (PARTITION BY spend) - 1) / 2.0
          AS r_spend
      FROM per_user
    )
    SELECT COUNT(*) AS n_users,
           round(corr(r_freq, r_spend), 6) AS spearman
    FROM ranked
    """,
)
def q_spearman(spark, sf_dir):
    """Dependence — Spearman rank correlation between per-user event
    frequency and total spend: Pearson correlation of midranks
    (tie-averaged), the monotone-association measure that survives the
    heavy tails breaking raw-value correlation. One user-keyed agg; each
    midrank table comes from a distributed zip_scan running count over
    the value GROUPS (midrank = prefix + (cnt+1)/2 — half-integer exact,
    bit-equal to the SQL twin's rank windows, no |users| global window),
    broadcast back onto the user rows; one corr aggregate."""
    from arrow_supercluster_spark.functions.distrank import zip_scan

    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("value"), 4).alias("spend"),
    )

    def midranks(col):
        groups = per_user.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        g, _, _ = zip_scan(groups, [col], out="_i", scan_col="cnt",
                           scan_out="_c")
        return g.select(
            col,
            (F.col("_c") - F.col("cnt") + (F.col("cnt") + 1) / 2.0)
            .alias(f"r_{col}"),
        )

    # plain equi-joins: the midrank tables are |distinct values|-sized —
    # usually tiny (AQE broadcasts them), but not forced, so a
    # pathological all-distinct column still just shuffles
    ranked = per_user.join(midranks("freq"), "freq").join(
        midranks("spend"), "spend"
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.corr("r_freq", "r_spend"), 6).alias("spearman"),
    )
