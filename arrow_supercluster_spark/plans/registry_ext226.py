"""Round-8 registry additions, batch 221 — B-cubed clustering scores,
equivalence testing, and the BIC Bayes factor:

- q_bcubed: B³ precision/recall/F1 for the sign-LSH bucket partition
  against labels (the q_partition_agreement frame) — per-item
  same-cluster/same-class overlap averaged over items, which reduces
  to Σnᵢⱼ²/a (precision mass) and Σnᵢⱼ²/b (recall mass) over the
  contingency cells.  B³ punishes lumping AND scattering per item,
  which pair-counting (ARI/FM) averages away.
- q_bf_bic: the BIC-approximate Bayes factor (Wagenmakers 2007) for
  the two-sample mean difference — BF₀₁ ≈ exp((BIC₁ − BIC₀)/2) from
  the pooled vs per-arm RSS; evidence FOR the null that p-values
  cannot express, approximation stated.

At 100 TB: B³ reads the existing contingency cells; the BF collapses
the arms with one user-grain agg + closed forms.  (A TOST entry was
drafted too — q_tost_equivalence already exists in registry_ext142.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext207 import (
    _SQL_CELLS,
    _spark_cells,
)
from arrow_supercluster_spark.sources.tables import read_events

_SQL_ARMS = """
    arms AS MATERIALIZED (
      SELECT user_id % 2 AS arm,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cents) AS sx, SUM(cents * cents) AS sxx
      FROM arms GROUP BY arm
    ),
    st AS (
      SELECT
        (SELECT n FROM s WHERE arm = 0) AS n0,
        (SELECT n FROM s WHERE arm = 1) AS n1,
        (SELECT sx * 1.0 / n FROM s WHERE arm = 0) AS m0,
        (SELECT sx * 1.0 / n FROM s WHERE arm = 1) AS m1,
        (SELECT (sxx - sx * 1.0 * sx / n) / (n - 1) FROM s WHERE arm = 0)
          AS v0,
        (SELECT (sxx - sx * 1.0 * sx / n) / (n - 1) FROM s WHERE arm = 1)
          AS v1
    )"""


def _spark_arms(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    arms = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("cents")
    ).select((F.col("user_id") % 2).alias("arm"), "cents")
    s = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).alias("sxx"),
    )
    a0 = s.filter(F.col("arm") == 0).select(
        F.col("n").alias("n0"),
        (F.col("sx") * 1.0 / F.col("n")).alias("m0"),
        (
            (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v0"),
    )
    a1 = s.filter(F.col("arm") == 1).select(
        F.col("n").alias("n1"),
        (F.col("sx") * 1.0 / F.col("n")).alias("m1"),
        (
            (F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v1"),
    )
    return a0.crossJoin(F.broadcast(a1))


@register(
    "q_bcubed",
    f"""
    WITH {_SQL_CELLS},
    mass AS (
      SELECT
        (SELECT SUM(nij * 1.0 * nij / a)
         FROM cells JOIN arow USING (bucket)) AS pmass,
        (SELECT SUM(nij * 1.0 * nij / b)
         FROM cells JOIN bcol USING (label)) AS rmass,
        (SELECT n FROM tot) AS n
    )
    SELECT CAST(n AS BIGINT) AS n_items,
           round(pmass / n, 6) AS b3_precision,
           round(rmass / n, 6) AS b3_recall,
           round(2.0 * (pmass / n) * (rmass / n)
                 / (pmass / n + rmass / n), 6) AS b3_f1
    FROM mass
    """,
)
def q_bcubed(spark, sf_dir):
    """R656 — B³ precision/recall/F1 of the sign-LSH bucket partition
    vs labels (the q_partition_agreement contingency): per-item
    precision = |cluster∩class|/|cluster| averages to Σnᵢⱼ²/a / n,
    recall to Σnᵢⱼ²/b / n.  Item-weighted (unlike pair-counting ARI),
    so one scattered big class hurts recall in proportion to its
    items.  Two keyed joins over the ≤|buckets|×|labels| cells."""
    cells, arow, bcol, tot = _spark_cells(spark, sf_dir)
    pmass = (
        cells.join(arow, "bucket")
        .agg(
            F.sum(
                F.col("nij") * 1.0 * F.col("nij") / F.col("a")
            ).alias("pmass")
        )
    )
    rmass = (
        cells.join(bcol, "label")
        .agg(
            F.sum(
                F.col("nij") * 1.0 * F.col("nij") / F.col("b")
            ).alias("rmass")
        )
    )
    j = (
        pmass.crossJoin(F.broadcast(rmass))
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("pmass") / F.col("n")
    r = F.col("rmass") / F.col("n")
    return j.select(
        F.col("n").cast("long").alias("n_items"),
        F.round(p, 6).alias("b3_precision"),
        F.round(r, 6).alias("b3_recall"),
        F.round(2.0 * p * r / (p + r), 6).alias("b3_f1"),
    )


@register(
    "q_bf_bic",
    f"""
    WITH {_SQL_ARMS},
    rss AS (
      SELECT st.n0 + st.n1 AS n,
             -- pooled (null) RSS from the overall mean
             (SELECT SUM((cents - g.m) * (cents - g.m)) FROM arms,
               (SELECT AVG(cents * 1.0) AS m FROM arms) g) AS rss0,
             -- per-arm (alternative) RSS
             (st.n0 - 1) * st.v0 + (st.n1 - 1) * st.v1 AS rss1
      FROM st
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(rss0, 2) AS rss_null,
           round(rss1, 2) AS rss_alt,
           round(n * ln(rss0 / rss1) - ln(n * 1.0), 6)
             AS two_log_bf10,
           round(exp((n * ln(rss0 / rss1) - ln(n * 1.0)) / 2.0), 6)
             AS bf10_bic,
           (exp((n * ln(rss0 / rss1) - ln(n * 1.0)) / 2.0) < 1.0)
             AS favors_null
    FROM rss
    """,
)
def q_bf_bic(spark, sf_dir):
    """R657 — BIC-approximate Bayes factor for the arm-mean difference
    (Wagenmakers 2007): 2·ln BF₁₀ ≈ n·ln(RSS₀/RSS₁) − ln n (one extra
    parameter), BF₁₀ = exp(·/2) — the unit-information-prior
    approximation, stated.  BF₁₀ < 1 is positive EVIDENCE for the
    null, the reading p-values cannot give.  One user-grain agg, one
    global-mean RSS pass, closed forms."""
    st = _spark_arms(spark, sf_dir)
    ev = read_events(spark, sf_dir)
    arms = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("cents")
    )
    g = arms.agg(F.avg(F.col("cents") * 1.0).alias("m"))
    rss0 = (
        arms.crossJoin(F.broadcast(g))
        .agg(
            F.sum(
                (F.col("cents") - F.col("m"))
                * (F.col("cents") - F.col("m"))
            ).alias("rss0")
        )
    )
    j = st.crossJoin(F.broadcast(rss0))
    n = F.col("n0") + F.col("n1")
    rss1 = (F.col("n0") - 1) * F.col("v0") + (F.col("n1") - 1) * F.col(
        "v1"
    )
    two_log_bf = n * F.log(F.col("rss0") / rss1) - F.log(n * 1.0)
    return j.select(
        n.cast("long").alias("n_users"),
        F.round("rss0", 2).alias("rss_null"),
        F.round(rss1, 2).alias("rss_alt"),
        F.round(two_log_bf, 6).alias("two_log_bf10"),
        F.round(F.exp(two_log_bf / 2.0), 6).alias("bf10_bic"),
        (F.exp(two_log_bf / 2.0) < 1.0).alias("favors_null"),
    )
