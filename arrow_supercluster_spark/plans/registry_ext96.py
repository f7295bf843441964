"""Round-4 registry additions, batch 91 — Bayesian experimentation,
incremental join maintenance, and propensity matching:

- q_bayes_ab: Bayesian A/B on the q_ab_test arms — Beta(1+k, 1+n−k)
  posteriors evaluated on a 200-point grid in LOG space (k·ln x +
  (n−k)·ln(1−x), max-subtracted per arm so x^70-scale terms don't
  underflow), P(pB > pA) from the grid cross product. Every term is
  the identical arithmetic on both engines.
- q_join_ivm: incremental view maintenance for a JOIN — the delta rule
  ΔJ = ΔR⋈S₀ ∪ R₀⋈ΔS ∪ ΔR⋈ΔS, with R/S split on INDEPENDENT
  predicates so all three delta terms are non-empty. The oracle twin
  is the plain full join + aggregate over all data: matching it IS the
  IVM correctness certificate. Extends R74's aggregate-IVM to joins.
- q_psm_att: propensity-score matching — each treated user matched to
  its nearest-score control within a banded as-of join (score buckets
  ±1, the bucketed-merge shape that avoids the treated×control cross
  product at scale), ATT = mean outcome gap over matches.

At 100 TB: the Bayes grid is O(1); IVM joins touch only delta-sized
inputs on two of three terms; PSM's band join is linear in users at
fixed band width.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_GRID = 200
_H_MULT, _H_MOD = 48271, 65537


@register(
    "q_bayes_ab",
    f"""
    WITH assign AS (
      SELECT user_id, user_id % 2 AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value > 90
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2
    ),
    arms AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS k
      FROM assign GROUP BY grp
    ),
    grid AS (SELECT (i - 0.5) / {_GRID} AS x
             FROM unnest(generate_series(1, {_GRID})) u(i)),
    logw AS (
      SELECT a.grp, g.x,
             a.k * ln(g.x) + (a.n - a.k) * ln(1 - g.x) AS lw
      FROM arms a CROSS JOIN grid g
    ),
    mx AS (SELECT grp, MAX(lw) AS m FROM logw GROUP BY grp),
    w AS (
      SELECT l.grp, l.x, exp(l.lw - mx.m) AS w
      FROM logw l JOIN mx ON mx.grp = l.grp
    ),
    z AS (SELECT grp, SUM(w) AS z FROM w GROUP BY grp),
    prob AS (
      SELECT SUM(w0.w * w1.w) AS num
      FROM w w0 JOIN w w1 ON w1.x > w0.x
      WHERE w0.grp = 0 AND w1.grp = 1
    )
    SELECT a0.n AS n0, a0.k AS k0, a1.n AS n1, a1.k AS k1,
           ROUND((SELECT num FROM prob)
                 / ((SELECT z FROM z WHERE grp = 0)
                    * (SELECT z FROM z WHERE grp = 1)), 4)
             AS p_b_beats_a
    FROM arms a0, arms a1 WHERE a0.grp = 0 AND a1.grp = 1
    """,
)
def q_bayes_ab(spark, sf_dir):
    """Bayesian two-arm comparison: discretized Beta posteriors (uniform
    prior) on a midpoint grid, P(pB > pA) = Σ_{{x1 > x0}} w0·w1 / Z0·Z1.
    Log-space weights with per-arm max subtraction keep the powers
    representable; the 200² cross term is a constant-size frame."""
    ev = read_events(spark, sf_dir)
    assign = ev.groupBy("user_id", (F.col("user_id") % 2).alias("grp")).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("conv")
    )
    arms = assign.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    grid = spark.range(1, _GRID + 1).select(
        ((F.col("id") - 0.5) / _GRID).alias("x")
    )
    logw = arms.crossJoin(grid).select(
        "grp", "x",
        (
            F.col("k") * F.log("x") + (F.col("n") - F.col("k")) * F.log(1 - F.col("x"))
        ).alias("lw"),
    )
    mx = logw.groupBy("grp").agg(F.max("lw").alias("m"))
    w = logw.join(mx, "grp").select(
        "grp", "x", F.exp(F.col("lw") - F.col("m")).alias("w")
    )
    z = w.groupBy("grp").agg(F.sum("w").alias("z"))
    w0 = w.filter("grp = 0").select(F.col("x").alias("x0"), F.col("w").alias("w0"))
    w1 = w.filter("grp = 1").select(F.col("x").alias("x1"), F.col("w").alias("w1"))
    num = w0.join(w1, F.col("x1") > F.col("x0")).agg(
        F.sum(F.col("w0") * F.col("w1")).alias("num")
    )
    z0 = z.filter("grp = 0").select(F.col("z").alias("z0"))
    z1 = z.filter("grp = 1").select(F.col("z").alias("z1"))
    a0 = arms.filter("grp = 0").select(
        F.col("n").alias("n0"), F.col("k").alias("k0")
    )
    a1 = arms.filter("grp = 1").select(
        F.col("n").alias("n1"), F.col("k").alias("k1")
    )
    return (
        a0.crossJoin(a1)
        .crossJoin(num)
        .crossJoin(z0)
        .crossJoin(z1)
        .select(
            "n0", "k0", "n1", "k1",
            F.round(F.col("num") / (F.col("z0") * F.col("z1")), 4).alias(
                "p_b_beats_a"
            ),
        )
    )


@register(
    "q_join_ivm",
    """
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l.l_extendedprice), 2) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_join_ivm(spark, sf_dir):
    """Join IVM certificate: R = orders split on orderkey%5=0 (ΔR),
    S = lineitem split on linenumber>=4 (ΔS) — independent predicates,
    so ΔR⋈S₀, R₀⋈ΔS and ΔR⋈ΔS are ALL non-empty. The view is
    maintained as J₀ ∪ the three delta joins and aggregated; the
    oracle's plain full join over everything must agree exactly. At
    scale two of the three terms are delta-sized — the whole point of
    IVM over recompute."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    r_new = o.filter(F.col("o_orderkey") % 5 == 0)
    r_old = o.filter(F.col("o_orderkey") % 5 != 0)
    s_new = li.filter(F.col("l_linenumber") >= 4)
    s_old = li.filter(F.col("l_linenumber") < 4)

    def j(r, s):
        return r.join(s, r.o_orderkey == s.l_orderkey).select(
            "o_orderpriority", "l_extendedprice"
        )

    view = (
        j(r_old, s_old)           # J0: the pre-existing materialization
        .unionByName(j(r_new, s_old))   # ΔR ⋈ S0
        .unionByName(j(r_old, s_new))   # R0 ⋈ ΔS
        .unionByName(j(r_new, s_new))   # ΔR ⋈ ΔS
    )
    return view.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


_PSM_BANDS = 20


@register(
    "q_psm_att",
    f"""
    WITH u AS (
      SELECT user_id, user_id % 2 AS treated,
             ((user_id * {_H_MULT}) % {_H_MOD}) * 1.0 / {_H_MOD} AS score,
             SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
               AS outcome
      FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, score, outcome,
                 CAST(floor(score * {_PSM_BANDS}) AS BIGINT) AS band
          FROM u WHERE treated = 1),
    c AS (SELECT user_id, score, outcome,
                 CAST(floor(score * {_PSM_BANDS}) AS BIGINT) AS band
          FROM u WHERE treated = 0),
    cand AS (
      SELECT t.user_id AS t_id, t.outcome AS t_out,
             c.user_id AS c_id, c.outcome AS c_out,
             abs(t.score - c.score) AS d
      FROM t JOIN c ON c.band BETWEEN t.band - 1 AND t.band + 1
    ),
    best AS (
      SELECT t_id, t_out, c_id, c_out FROM (
        SELECT *, row_number() OVER (PARTITION BY t_id
                                     ORDER BY d, c_id) AS rn
        FROM cand
      ) WHERE rn = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
           ROUND(AVG(t_out - c_out), 4) AS att
    FROM best
    """,
)
def q_psm_att(spark, sf_dir):
    """Propensity-score matching ATT: treated users (id parity) match
    their nearest-score control WITHIN ±1 score band (the banded as-of
    join — candidates are band neighbors, never the full treated ×
    control cross product), deterministic (distance, control-id)
    tie-break, ATT = mean treated−control outcome gap. Treated rows
    with no control in the band are unmatched and drop (caliper
    semantics, documented). The match window partitions by treated
    user — bounded by band occupancy."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    u = ev.groupBy("user_id", (F.col("user_id") % 2).alias("treated")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                0.0
            )
        ).alias("outcome")
    ).select(
        "user_id", "treated", "outcome",
        (((F.col("user_id") * _H_MULT) % _H_MOD) / F.lit(float(_H_MOD))).alias(
            "score"
        ),
        F.floor(
            ((F.col("user_id") * _H_MULT) % _H_MOD) / F.lit(float(_H_MOD))
            * _PSM_BANDS
        ).alias("band"),
    )
    t = u.filter("treated = 1").select(
        F.col("user_id").alias("t_id"),
        F.col("score").alias("ts"),
        F.col("outcome").alias("t_out"),
        F.col("band").alias("tb"),
    )
    c = u.filter("treated = 0").select(
        F.col("user_id").alias("c_id"),
        F.col("score").alias("cs"),
        F.col("outcome").alias("c_out"),
        F.col("band").alias("cb"),
    )
    cand = t.join(
        c,
        (F.col("cb") >= F.col("tb") - 1) & (F.col("cb") <= F.col("tb") + 1),
    ).select(
        "t_id", "t_out", "c_id", "c_out",
        F.abs(F.col("ts") - F.col("cs")).alias("d"),
    )
    w = Window.partitionBy("t_id").orderBy("d", "c_id")
    best = cand.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return best.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(F.avg(F.col("t_out") - F.col("c_out")), 4).alias("att"),
    )
