"""Round-2 registry additions, batch 63 — lifetime value and effect
size:

- q_ltv_triangle: the LTV triangle — cumulative revenue per signup-week
  cohort by age week (the retention matrix in currency);
- q_cohens_d: Cohen's d standardized effect size between the experiment
  arms (the magnitude companion to q_ab_test's significance).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_ANCHOR = "2024-01-01"


@register(
    "q_ltv_triangle",
    f"""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor((MIN(epoch_us(ts))
                         - epoch_us(TIMESTAMP '{_ANCHOR}'))
                        / 604800000000.0) AS BIGINT) AS cohort_week
      FROM events GROUP BY 1
    ),
    rev AS (
      SELECT e.user_id, f.cohort_week,
             CAST(floor((epoch_us(e.ts) - epoch_us(TIMESTAMP '{_ANCHOR}'))
                        / 604800000000.0) AS BIGINT) - f.cohort_week
               AS age_week,
             e.value
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
    ),
    cells AS (
      SELECT cohort_week, age_week, round(SUM(value), 4) AS revenue
      FROM rev GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_users FROM firsts GROUP BY 1
    )
    SELECT c.cohort_week, c.age_week, s.cohort_users, c.revenue,
           round(SUM(c.revenue) OVER (PARTITION BY c.cohort_week
             ORDER BY c.age_week
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / s.cohort_users, 6) AS cum_ltv_per_user
    FROM cells c JOIN sizes s USING (cohort_week)
    """,
)
def q_ltv_triangle(spark, sf_dir):
    """Product economics — the LTV TRIANGLE: purchase revenue per
    (signup-week cohort × age week), with cumulative LTV per cohort
    user — the retention matrix in currency, the table payback-period
    decisions read off (q_retention_cohorts prices its counts). One
    user collapse for cohorts, one cohort-joined revenue agg; the
    cumulative window runs on the |cohorts|×|ages| triangle."""
    ev = read_events(spark, sf_dir)
    anchor = F.unix_micros(F.to_timestamp(F.lit(_ANCHOR)))
    firsts = ev.groupBy("user_id").agg(
        F.floor((F.min(F.unix_micros("ts")) - anchor) / 604800000000.0)
        .cast("long")
        .alias("cohort_week")
    )
    rev = (
        ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.floor((F.unix_micros("ts") - anchor) / 604800000000.0).cast("long")
                - F.col("cohort_week")
            ).alias("age_week"),
            "value",
        )
    )
    cells = rev.groupBy("cohort_week", "age_week").agg(
        F.round(F.sum("value"), 4).alias("revenue")
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week", "age_week", "cohort_users", "revenue",
        F.round(F.sum("revenue").over(w) / F.col("cohort_users"), 6).alias(
            "cum_ltv_per_user"
        ),
    )


@register(
    "q_cohens_d",
    """
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm, round(SUM(value), 4) AS spend
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    g AS (
      SELECT arm, COUNT(*) AS n, AVG(spend) AS mu,
             var_samp(spend) AS v
      FROM per_user GROUP BY 1
    ),
    w AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 0 THEN mu END) AS mu0,
             MAX(CASE WHEN arm = 0 THEN v END) AS v0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 1 THEN mu END) AS mu1,
             MAX(CASE WHEN arm = 1 THEN v END) AS v1
      FROM g
    )
    SELECT n0, n1,
           round(mu1 - mu0, 6) AS mean_diff,
           round(sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)), 6)
             AS pooled_sd,
           round((mu1 - mu0)
                 / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2)), 6)
             AS cohens_d
    FROM w
    """,
)
def q_cohens_d(spark, sf_dir):
    """Experimentation — Cohen's d between the arms' spend: the
    standardized MAGNITUDE that significance tests (q_ab_test,
    q_mann_whitney) deliberately don't report — at scale everything is
    'significant' and d is the number that says whether anyone should
    care (0.2 small / 0.5 medium / 0.8 large). Pooled-variance form;
    one user collapse + a 2-row moment agg."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per_user = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("arm")
    ).agg(F.round(F.sum("value"), 4).alias("spend"))
    g = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("spend").alias("mu"),
        F.var_samp("spend").alias("v"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("arm") == i, F.col(c))).alias(f"{c}{i}")
            for i in (0, 1)
            for c in ("n", "mu", "v")
        ]
    )
    pooled = F.sqrt(
        ((F.col("n0") - 1) * F.col("v0") + (F.col("n1") - 1) * F.col("v1"))
        / (F.col("n0") + F.col("n1") - 2)
    )
    return w.select(
        "n0", "n1",
        F.round(F.col("mu1") - F.col("mu0"), 6).alias("mean_diff"),
        F.round(pooled, 6).alias("pooled_sd"),
        F.round((F.col("mu1") - F.col("mu0")) / pooled, 6).alias("cohens_d"),
    )
