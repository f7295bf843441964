"""Round-7 registry additions, batch 192 — operational-decision and
privacy-accounting operators:

- q_newsvendor: the critical-fractile stocking rule — optimal stock =
  type-1 quantile of daily purchase demand at cu/(cu+co) (cu=3 underage,
  co=1 overage → 0.75, stated), with expected daily cost at the optimum
  vs the round-mean-stock baseline.  THE inventory readout of a demand
  pipeline; everything runs on the ≤61-row day frame.
- q_dp_laplace: differential-privacy accounting for the two release
  queries a platform publishes (per-corpus purchase count, Δ=1; clipped
  value sum, Δ=C=1000 cents-clip stated): Laplace scale b = Δ/ε over the
  ε grid {0.1, 1, 8}, expected absolute error (=b), relative error
  against the true aggregate, and a 1%-utility bit.
- q_transition_entropy: per-state entropy of the next-event-type
  distribution from (ts, event_id)-ordered per-user sequences (the
  R486 construction, terminal events dropped), normalized by ln of the
  state's out-degree, plus the chain's entropy rate Σ π_i H_i.

At 100 TB: newsvendor collapses to days then works on day-pair joins;
DP accounting is two global aggregates crossed with a literal grid;
transition entropy is one user-partitioned lead window (never global)
into a ≤k² cell frame.  All probabilities are ratios of exact integer
counts; outputs round to 6.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_NV_CU, _NV_CO = 3, 1  # underage / overage unit costs (stated)
_DP_EPS = (0.1, 1.0, 8.0)
_DP_CLIP = 1000.0


# ===========================================================================
# R572 — newsvendor critical-fractile stocking
# ===========================================================================

@register(
    "q_newsvendor",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS demand
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(demand) AS BIGINT) AS total
          FROM daily),
    cum AS (
      SELECT a.demand,
             CAST(COUNT(*) AS BIGINT) AS cum_cnt
      FROM (SELECT DISTINCT demand FROM daily) a
      JOIN daily b ON b.demand <= a.demand
      GROUP BY 1
    ),
    qstar AS (
      SELECT MIN(demand) AS q_star
      FROM cum CROSS JOIN n
      WHERE cum_cnt * ({_NV_CU} + {_NV_CO}) >= {_NV_CU} * n_days
    ),
    base AS (
      SELECT CAST(round(total * 1.0 / n_days) AS BIGINT) AS q_mean
      FROM n
    ),
    costs AS (
      SELECT
        SUM({_NV_CU} * GREATEST(demand - q_star, 0)
            + {_NV_CO} * GREATEST(q_star - demand, 0)) AS c_star,
        SUM({_NV_CU} * GREATEST(demand - q_mean, 0)
            + {_NV_CO} * GREATEST(q_mean - demand, 0)) AS c_mean
      FROM daily CROSS JOIN qstar CROSS JOIN base
    )
    SELECT n_days, q_star, q_mean,
           round(c_star * 1.0 / n_days, 6) AS cost_at_qstar,
           round(c_mean * 1.0 / n_days, 6) AS cost_at_mean,
           c_star <= c_mean AS qstar_no_worse
    FROM costs CROSS JOIN n CROSS JOIN qstar CROSS JOIN base
    """,
)
def q_newsvendor(spark, sf_dir):
    """R572 — q* = min{{q : ECDF(q) ≥ cu/(cu+co)}} (type-1 quantile,
    integer-exact via cum_cnt·(cu+co) ≥ cu·n), expected daily cost
    cu·E[(D−q)⁺] + co·E[(q−D)⁺] at q* and at the rounded mean.  The
    critical-fractile optimality makes qstar_no_worse a theorem over
    any empirical distribution — asserted in the test."""
    ev = read_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("demand"))
    )
    n = daily.agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("demand").alias("total")
    )
    dv = daily.select("demand").distinct()
    b = daily.select(F.col("demand").alias("bdem"))
    cum = (
        dv.join(b, F.col("bdem") <= F.col("demand"))
        .groupBy("demand")
        .agg(F.count(F.lit(1)).alias("cum_cnt"))
    )
    qstar = (
        cum.crossJoin(F.broadcast(n))
        .filter(
            F.col("cum_cnt") * (_NV_CU + _NV_CO)
            >= _NV_CU * F.col("n_days")
        )
        .agg(F.min("demand").alias("q_star"))
    )
    base = n.select(
        F.round(F.col("total") * 1.0 / F.col("n_days"))
        .cast("long")
        .alias("q_mean")
    )
    costs = (
        daily.crossJoin(F.broadcast(qstar))
        .crossJoin(F.broadcast(base))
        .agg(
            F.sum(
                _NV_CU
                * F.greatest(F.col("demand") - F.col("q_star"), F.lit(0))
                + _NV_CO
                * F.greatest(F.col("q_star") - F.col("demand"), F.lit(0))
            ).alias("c_star"),
            F.sum(
                _NV_CU
                * F.greatest(F.col("demand") - F.col("q_mean"), F.lit(0))
                + _NV_CO
                * F.greatest(F.col("q_mean") - F.col("demand"), F.lit(0))
            ).alias("c_mean"),
        )
    )
    return (
        costs.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(qstar))
        .crossJoin(F.broadcast(base))
        .select(
            "n_days",
            "q_star",
            "q_mean",
            F.round(F.col("c_star") * 1.0 / F.col("n_days"), 6).alias(
                "cost_at_qstar"
            ),
            F.round(F.col("c_mean") * 1.0 / F.col("n_days"), 6).alias(
                "cost_at_mean"
            ),
            (F.col("c_star") <= F.col("c_mean")).alias("qstar_no_worse"),
        )
    )


# ===========================================================================
# R573 — Laplace-mechanism DP accounting
# ===========================================================================

@register(
    "q_dp_laplace",
    f"""
    WITH truth AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_purch,
             SUM(LEAST(CAST(round(value * 100) AS BIGINT),
                       CAST({_DP_CLIP} * 100 AS BIGINT))) / 100.0
               AS sum_clip
      FROM events WHERE event_type = 'purchase'
    ),
    grid AS (
      SELECT eps FROM (VALUES
        {', '.join(f'({e})' for e in _DP_EPS)}) g(eps)
    ),
    rows_ AS (
      SELECT 'count_purchases' AS query, eps,
             CAST(n_purch AS DOUBLE) AS true_value,
             1.0 / eps AS laplace_b
      FROM truth CROSS JOIN grid
      UNION ALL
      SELECT 'sum_value_clipped', eps, sum_clip, {_DP_CLIP} / eps
      FROM truth CROSS JOIN grid
    )
    SELECT query, eps, round(true_value, 2) AS true_value,
           round(laplace_b, 6) AS laplace_b,
           round(laplace_b, 6) AS expected_abs_error,
           round(laplace_b / true_value, 6) AS rel_error,
           laplace_b / true_value < 0.01 AS utility_ok
    FROM rows_
    ORDER BY query, eps
    """,
)
def q_dp_laplace(spark, sf_dir):
    """R573 — Laplace mechanism accounting: sensitivity Δ=1 for the
    purchase count, Δ=C (the stated 1000-unit clip) for the clipped
    value sum; scale b = Δ/ε and E|noise| = b per ε ∈ {{0.1, 1, 8}};
    utility bit at 1% relative error.  Two exact global folds crossed
    with a literal grid."""
    ev = read_events(spark, sf_dir)
    cents_clip = F.least(
        F.round(F.col("value") * 100).cast("long"),
        F.lit(int(_DP_CLIP * 100)),
    )
    truth = (
        ev.filter(F.col("event_type") == "purchase")
        .agg(
            F.count(F.lit(1)).alias("n_purch"),
            (F.sum(cents_clip) / 100.0).alias("sum_clip"),
        )
    )
    grid = spark.createDataFrame(
        [(e,) for e in _DP_EPS], "eps DOUBLE"
    )
    count_rows = truth.crossJoin(F.broadcast(grid)).select(
        F.lit("count_purchases").alias("query"),
        "eps",
        F.col("n_purch").cast("double").alias("true_value"),
        (1.0 / F.col("eps")).alias("laplace_b"),
    )
    sum_rows = truth.crossJoin(F.broadcast(grid)).select(
        F.lit("sum_value_clipped").alias("query"),
        "eps",
        F.col("sum_clip").alias("true_value"),
        (_DP_CLIP / F.col("eps")).alias("laplace_b"),
    )
    rows = count_rows.unionByName(sum_rows)
    return rows.select(
        "query",
        "eps",
        F.round("true_value", 2).alias("true_value"),
        F.round("laplace_b", 6).alias("laplace_b"),
        F.round("laplace_b", 6).alias("expected_abs_error"),
        F.round(F.col("laplace_b") / F.col("true_value"), 6).alias(
            "rel_error"
        ),
        (F.col("laplace_b") / F.col("true_value") < 0.01).alias(
            "utility_ok"
        ),
    ).orderBy("query", "eps")


# ===========================================================================
# R574 — next-event transition entropy
# ===========================================================================

@register(
    "q_transition_entropy",
    """
    WITH seq AS (
      SELECT event_type AS a,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS b
      FROM events
    ),
    cells AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
    ),
    row_tot AS (
      SELECT a, CAST(SUM(n) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS k_next
      FROM cells GROUP BY a
    ),
    rows_ AS (
      SELECT c.a, MAX(r.t) AS t, MAX(r.k_next) AS k_next,
             SUM(-(c.n * 1.0 / r.t) * ln(c.n * 1.0 / r.t)) AS h
      FROM cells c JOIN row_tot r ON r.a = c.a
      GROUP BY c.a
    ),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS grand FROM rows_),
    rate AS (
      SELECT SUM(t * 1.0 / grand * h) AS entropy_rate
      FROM rows_ CROSS JOIN tot
    )
    SELECT a AS state, t AS n_trans, k_next,
           round(h, 6) AS entropy,
           round(CASE WHEN k_next > 1 THEN h / ln(k_next) END, 6)
             AS norm_entropy,
           round(entropy_rate, 6) AS entropy_rate
    FROM rows_ CROSS JOIN rate
    ORDER BY state
    """,
)
def q_transition_entropy(spark, sf_dir):
    """R574 — H_a = −Σ_b p_ab ln p_ab over the R486 sequence
    construction (terminals dropped), normalized by ln(out-degree),
    plus the chain entropy rate Σ π_a H_a with π = row-mass share.
    The lead window is user-partitioned (never global); the entropy
    algebra runs on the ≤k² cell frame."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    cells = seq.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    row_tot = cells.groupBy("a").agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("k_next")
    )
    p = F.col("n") * 1.0 / F.col("t")
    rows = (
        cells.join(F.broadcast(row_tot), "a")
        .groupBy("a", "t", "k_next")
        .agg(F.sum(-p * F.log(p)).alias("h"))
    )
    tot = rows.agg(F.sum("t").alias("grand"))
    rate = (
        rows.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("t") * 1.0 / F.col("grand") * F.col("h")
            ).alias("entropy_rate")
        )
    )
    return (
        rows.crossJoin(F.broadcast(rate))
        .select(
            F.col("a").alias("state"),
            F.col("t").alias("n_trans"),
            "k_next",
            F.round("h", 6).alias("entropy"),
            F.round(
                F.when(
                    F.col("k_next") > 1,
                    F.col("h") / F.log(F.col("k_next").cast("double")),
                ),
                6,
            ).alias("norm_entropy"),
            F.round("entropy_rate", 6).alias("entropy_rate"),
        )
        .orderBy("state")
    )
