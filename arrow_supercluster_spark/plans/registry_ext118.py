"""Round-5 registry additions, batch 113 — the recursive-CTE surface,
Wilson-score ranking, and the K-group rank test on distrank:

- q_recursive_cte: WITH RECURSIVE over a derived parent hierarchy
  (node → node DIV 2 binary tree on custkeys) — Spark 4's UNION ALL
  fixpoint executes each step as a distributed join, DuckDB runs the
  same recursion natively; per-depth rollup out. The SQL surface that
  un-flattens hierarchies (BOM walks, org charts, category closures).
- q_wilson_ranking: lower-bound-of-the-Wilson-interval ranking of
  per-user click-through — the "how to NOT sort by average rating"
  statistic; small-sample users sink even with perfect rates.
- q_kruskal_wallis: K-group rank test (the ANOVA fallback without
  normality), with EXACT integer rank sums: tie groups get
  2·avg_rank = 2·cum_less + t + 1 (an integer), the global cumulative
  count comes from distrank.zip_scan over the DISTINCT-value frame (no
  unpartitioned window anywhere), and H + tie correction are closed
  forms over per-group integer totals.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.functions import distrank
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.session import register_views

_WILSON_Z = 1.96


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ===========================================================================
# R336 — recursive CTE hierarchy walk
# ===========================================================================

def _recursive_sql(div: str) -> str:
    return f"""
    WITH RECURSIVE walk AS (
      SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT c.c_custkey AS node, w.depth + 1 AS depth
      FROM customer c JOIN walk w
        ON c.c_custkey {div} 2 = w.node AND c.c_custkey >= 1
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM walk
    GROUP BY depth
    ORDER BY depth
    """


@register("q_recursive_cte", _recursive_sql("//"))
def q_recursive_cte(spark, sf_dir):
    """R336 — WITH RECURSIVE transitive walk of the node → node DIV 2
    binary-tree hierarchy derived on custkeys (root 0): the same
    recursion text runs through `spark.sql()` (Spark 4 plans each
    recursive step as a distributed self-join against the previous
    frontier — the frontier shrinks-or-grows per level, never funnels
    to one task) and through DuckDB's native recursive CTE. Depth is
    structurally bounded at log2(max custkey) ≈ 20-30 at any corpus
    size, so the fixpoint terminates in a bounded number of joins —
    the property that makes recursive CTEs safe at 100 TB where an
    unbounded graph walk would not be. Per-depth rollup keeps the
    oracle comparison exact-integer."""
    register_views(spark, sf_dir)
    return spark.sql(_recursive_sql("DIV"))


# ===========================================================================
# R337 — Wilson lower-bound ranking
# ===========================================================================

@register(
    "q_wilson_ranking",
    f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS successes,
             CAST(SUM(CASE WHEN event_type IN ('click', 'view')
                           THEN 1 ELSE 0 END) AS BIGINT) AS trials
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, successes, trials,
             successes * 1.0 / trials AS naive_rate,
             ((successes * 1.0 / trials) + {_WILSON_Z} * {_WILSON_Z} / (2.0 * trials)
              - {_WILSON_Z} * sqrt(((successes * 1.0 / trials) * (1.0 - successes * 1.0 / trials)
                       + {_WILSON_Z} * {_WILSON_Z} / (4.0 * trials)) / trials))
             / (1.0 + {_WILSON_Z} * {_WILSON_Z} / trials) AS wilson_lb
      FROM per_user WHERE trials > 0
    )
    SELECT user_id, successes, trials,
           round(naive_rate, 6) AS naive_rate,
           round(wilson_lb, 6) AS wilson_lb
    FROM scored
    ORDER BY wilson_lb DESC, user_id
    LIMIT 10
    """,
)
def q_wilson_ranking(spark, sf_dir):
    """R337 — Wilson-interval lower-bound ranking of per-user CTR
    (clicks / (clicks+views)), z={z}: the ranking statistic that fixes
    "sort by average" — a 2/2 user ranks below a 40/50 user because the
    LB prices in sample size. One keyed agg → closed-form per-row
    score (integer inputs, IEEE-exact ops incl. correctly-rounded
    sqrt → bit-stable ordering) → TakeOrdered top-10.""".format(
        z=_WILSON_Z
    )
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("successes"),
        F.sum(
            F.when(F.col("event_type").isin("click", "view"), 1).otherwise(0)
        ).alias("trials"),
    ).filter(F.col("trials") > 0)
    p = F.col("successes") * 1.0 / F.col("trials")
    z2 = _WILSON_Z * _WILSON_Z
    lb = (
        p
        + z2 / (2.0 * F.col("trials"))
        - _WILSON_Z
        * F.sqrt(
            (p * (1.0 - p) + z2 / (4.0 * F.col("trials")))
            / F.col("trials")
        )
    ) / (1.0 + z2 / F.col("trials"))
    return (
        per_user.select(
            "user_id",
            "successes",
            "trials",
            F.round(p, 6).alias("naive_rate"),
            F.round(lb, 6).alias("wilson_lb"),
        )
        # order by the ROUNDED score (both engines) so a last-ulp tie
        # can never flip the top-10 cut between engines
        .orderBy(F.col("wilson_lb").desc(), "user_id")
        .limit(10)
    )


# ===========================================================================
# R338 — Kruskal-Wallis H with exact integer rank sums (distrank)
# ===========================================================================

@register(
    "q_kruskal_wallis",
    """
    WITH ev AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    ties AS (SELECT cents, COUNT(*) AS t FROM ev GROUP BY cents),
    ranked AS (
      SELECT cents, t,
             SUM(t) OVER (ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - t AS cum_less
      FROM ties
    ),
    rank2 AS (SELECT cents, 2 * cum_less + t + 1 AS r2 FROM ranked),
    groups AS (
      SELECT ev.event_type,
             COUNT(*) AS n_j,
             SUM(rank2.r2) AS r2_sum
      FROM ev JOIN rank2 USING (cents)
      GROUP BY ev.event_type
    ),
    tot AS (
      SELECT SUM(n_j) AS n,
             SUM((r2_sum * 1.0 / 2) * (r2_sum * 1.0 / 2) / n_j) AS sq
      FROM groups
    ),
    tiecorr AS (
      SELECT 1.0 - SUM(t * t * t - t) * 1.0
               / ((SELECT n FROM tot) * (SELECT n FROM tot)
                  * (SELECT n FROM tot) - (SELECT n FROM tot)) AS c
      FROM ties
    )
    SELECT CAST((SELECT COUNT(*) FROM groups) - 1 AS BIGINT) AS df,
           CAST(tot.n AS BIGINT) AS n,
           round(12.0 / (tot.n * (tot.n + 1)) * tot.sq
                 - 3.0 * (tot.n + 1), 6) AS h_stat,
           round((12.0 / (tot.n * (tot.n + 1)) * tot.sq
                 - 3.0 * (tot.n + 1)) / tiecorr.c, 6) AS h_corrected,
           round(tiecorr.c, 8) AS tie_correction
    FROM tot CROSS JOIN tiecorr
    """,
)
def q_kruskal_wallis(spark, sf_dir):
    """R338 — Kruskal-Wallis H across the event types, exact-integer
    construction: values snap to cents; each distinct value's tie group
    carries 2·avg_rank = 2·cum_less + t + 1 (an INTEGER — midranks in
    halves), with cum_less from distrank.zip_scan over the DISTINCT
    -cents frame (|distinct| ≪ |rows|; no unpartitioned window, no
    single-reducer stage — the oracle's window form is the semantic
    twin, not the plan). Per-group rank sums are exact BIGINTs; H and
    the tie correction 1 − Σ(t³−t)/(N³−N) are closed forms on those
    totals (R2_j ≤ 2N² stays double-exact far past 10⁸ rows). The
    K-group extension of q_mann_whitney."""
    ev = _events(spark, sf_dir).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    ties = ev.groupBy("cents").agg(F.count(F.lit(1)).alias("t"))
    ranked, _, _ = distrank.zip_scan(
        ties, ["cents"], out="_idx", scan_col="t", scan_out="cum"
    )
    rank2 = ranked.select(
        "cents",
        "t",
        (
            2 * (F.col("cum").cast("long") - F.col("t"))
            + F.col("t")
            + 1
        ).alias("r2"),
    )
    groups = (
        ev.join(rank2.select("cents", "r2"), "cents")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_j"), F.sum("r2").alias("r2_sum"))
    )
    tot = groups.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_j").alias("n"),
        F.sum(
            (F.col("r2_sum") * 1.0 / 2)
            * (F.col("r2_sum") * 1.0 / 2)
            / F.col("n_j")
        ).alias("sq"),
    )
    tcorr = ties.agg(
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("t3")
    )
    n = F.col("n")
    h = 12.0 / (n * (n + 1)) * F.col("sq") - 3.0 * (n + 1)
    return (
        tot.crossJoin(F.broadcast(tcorr))
        .select(
            (F.col("k") - 1).cast("long").alias("df"),
            n.cast("long").alias("n"),
            F.round(h, 6).alias("h_stat"),
            F.round(
                h
                / (
                    1.0
                    - F.col("t3") * 1.0 / (n * n * n - n)
                ),
                6,
            ).alias("h_corrected"),
            F.round(
                1.0 - F.col("t3") * 1.0 / (n * n * n - n), 8
            ).alias("tie_correction"),
        )
    )
