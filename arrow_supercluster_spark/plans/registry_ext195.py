"""Round-7 registry additions, batch 190 — the eval-arena pack
(benchmark scoring machinery for model-comparison pipelines):

- q_pass_at_k: the unbiased pass@k estimator (Chen et al. 2021,
  published): per problem 1 − C(n−c,k)/C(n,k) evaluated as the exact
  unrolled product Π_{i<k}(n−c−i)/(n−i) — k ≤ 10, so the product is a
  CLOSED-FORM expression (identical factor-by-factor association in
  both engines), no aggregation inside a problem.  Problems = users,
  samples = purchase events, "correct" = value > 700 (stated).
- q_bradley_terry: arena-style strength ratings of the five event
  types from daily head-to-head duels (higher daily count wins, ties
  skipped): four unrolled minorization-maximization iterations
  w_i ← W_i / Σ_j n_ij/(w_i+w_j), mean-1-normalized each step — the
  q_ipf_raking unrolled-iteration precedent on a 5-row frame.
- q_item_analysis: classical-test-theory item statistics per event
  type — difficulty p_i = share of users "solving" the item (≥1
  event of the type with value > 600) and point-biserial
  discrimination r_pb = (M₁−M₀)/σ_S·√(p(1−p)) against the user's
  total solved count (population σ, stated).

At 100 TB: pass@k and item analysis collapse the corpus once on
user_id and finish on per-user rows with closed-form expressions;
Bradley-Terry collapses to a ≤61×5 day frame, and the MM iterations
run on 5-row/20-row frames.  All inputs to every double are exact
integers; outputs round to 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_PK_KS = (1, 5, 10)
_PK_CORRECT_MIN = 700.0
_BT_ITERS = 4
_IA_SOLVE_MIN = 600.0
_IA_TYPES = 5  # event_type cardinality (stated domain)


# ===========================================================================
# R566 — unbiased pass@k
# ===========================================================================

def _pk_fail_sql(k: int) -> str:
    prod = "1.0"
    for i in range(k):
        prod = f"({prod} * ((n - c - {i}) * 1.0 / (n - {i})))"
    return f"CASE WHEN n - c < {k} THEN 0.0 ELSE {prod} END"


def _pk_fail_col(k: int):
    prod = F.lit(1.0)
    n, c = F.col("n"), F.col("c")
    for i in range(k):
        prod = prod * ((n - c - F.lit(i)) * 1.0 / (n - F.lit(i)))
    return F.when(n - c < k, 0.0).otherwise(prod)


@register(
    "q_pass_at_k",
    f"""
    WITH probs AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value > {_PK_CORRECT_MIN}
                           THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    per_k AS (
      {' UNION ALL '.join(
          f'''SELECT {k} AS k,
                 CAST(COUNT(*) AS BIGINT) AS n_problems,
                 AVG(1.0 - ({_pk_fail_sql(k)})) AS pass_rate
              FROM probs WHERE n >= {k}'''
          for k in _PK_KS)}
    )
    SELECT k, n_problems, round(pass_rate, 6) AS pass_at_k
    FROM per_k ORDER BY k
    """,
)
def q_pass_at_k(spark, sf_dir):
    """R566 — pass@k = E_problems[1 − Π_{{i<k}}(n−c−i)/(n−i)]
    (the unbiased estimator; problems with n < k excluded, n−c < k
    short-circuits to pass=1).  The product unrolls to the same
    left-associated factor chain in both engines — exact doubles."""
    ev = read_events(spark, sf_dir)
    probs = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") > _PK_CORRECT_MIN, 1).otherwise(0)
            ).alias("c"),
        )
    )
    parts = [
        probs.filter(F.col("n") >= k).agg(
            F.lit(k).alias("k"),
            F.count(F.lit(1)).alias("n_problems"),
            F.avg(1.0 - _pk_fail_col(k)).alias("pass_rate"),
        )
        for k in _PK_KS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "k", "n_problems", F.round("pass_rate", 6).alias("pass_at_k")
    ).orderBy("k")


# ===========================================================================
# R567 — Bradley-Terry strengths from daily duels
# ===========================================================================

def _bt_sql() -> str:
    ctes = [
        """daily AS (
      SELECT event_type AS t, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )""",
        """duels AS (
      SELECT a.t AS ti, b.t AS tj,
             CAST(COUNT(*) AS BIGINT) AS n_ij,
             CAST(SUM(CASE WHEN a.n > b.n THEN 1 ELSE 0 END) AS BIGINT)
               AS w_ij
      FROM daily a JOIN daily b
        ON a.d = b.d AND a.t <> b.t AND a.n <> b.n
      GROUP BY 1, 2
    )""",
        """wins AS (
      SELECT ti AS t, CAST(SUM(w_ij) AS BIGINT) AS W,
             CAST(SUM(n_ij) AS BIGINT) AS n_comp
      FROM duels GROUP BY 1
    )""",
        "it0 AS (SELECT t, 1.0 AS w FROM wins)",
    ]
    for s in range(1, _BT_ITERS + 1):
        prev = f"it{s - 1}"
        ctes.append(
            f"""raw{s} AS (
      SELECT d.ti AS t,
             MAX(wn.W) / SUM(d.n_ij / (wi.w + wj.w)) AS w
      FROM duels d
      JOIN {prev} wi ON wi.t = d.ti
      JOIN {prev} wj ON wj.t = d.tj
      JOIN wins wn ON wn.t = d.ti
      GROUP BY 1
    )"""
        )
        ctes.append(
            f"""it{s} AS (
      SELECT t, w * (SELECT COUNT(*) FROM raw{s})
                 / (SELECT SUM(w) FROM raw{s}) AS w
      FROM raw{s}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT wins.t AS event_type, n_comp AS comparisons,
           wins.W AS wins,
           round(it{_BT_ITERS}.w, 6) AS strength
    FROM wins JOIN it{_BT_ITERS} ON it{_BT_ITERS}.t = wins.t
    ORDER BY event_type
    """
    )


@register("q_bradley_terry", _bt_sql())
def q_bradley_terry(spark, sf_dir):
    """R567 — Bradley-Terry via 4 unrolled MM passes on the 5-type
    frame: w_i ← W_i / Σ_j n_ij/(w_i+w_j), renormalized to mean 1
    each pass (the q_ipf_raking unrolled-iteration pattern).  Duels
    come from the ≤61-day daily-count frame; ties are skipped."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        F.col("event_type").alias("t"), F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    b = daily.select(
        F.col("t").alias("tj"), F.col("d").alias("bd"), F.col("n").alias("bn")
    )
    duels = (
        daily.join(
            b,
            (F.col("d") == F.col("bd"))
            & (F.col("t") != F.col("tj"))
            & (F.col("n") != F.col("bn")),
        )
        .groupBy(F.col("t").alias("ti"), "tj")
        .agg(
            F.count(F.lit(1)).alias("n_ij"),
            F.sum(
                F.when(F.col("n") > F.col("bn"), 1).otherwise(0)
            ).alias("w_ij"),
        )
    )
    from arrow_supercluster_spark.functions.checkpoint import truncate

    # materialize the <=|types|² duel frame ONCE — each MM iteration
    # joins it twice, and without the cut every pass would re-scan the
    # corpus (the q_ipf_raking materialized-pass discipline)
    duels = truncate(duels)
    wins = duels.groupBy(F.col("ti").alias("t")).agg(
        F.sum("w_ij").alias("W"), F.sum("n_ij").alias("n_comp")
    )
    # aliased copy for in-loop use: fresh exprIds, no self-join lineage
    wins_t = duels.groupBy("ti").agg(F.sum("w_ij").alias("tot_w"))
    it = duels.select(F.col("ti").alias("t")).distinct().withColumn(
        "w", F.lit(1.0)
    )
    for _ in range(_BT_ITERS):
        wi = it.select(F.col("t").alias("ti"), F.col("w").alias("w_i"))
        wj = it.select(F.col("t").alias("tj"), F.col("w").alias("w_j"))
        raw = (
            duels.join(F.broadcast(wi), "ti")
            .join(F.broadcast(wj), "tj")
            .join(F.broadcast(wins_t), "ti")
            .groupBy(F.col("ti").alias("t"))
            .agg(
                (
                    F.max("tot_w")
                    / F.sum(
                        F.col("n_ij") / (F.col("w_i") + F.col("w_j"))
                    )
                ).alias("w")
            )
        )
        norm = raw.agg(
            F.count(F.lit(1)).alias("_k"), F.sum("w").alias("_s")
        )
        # r10: truncate per pass — wi/wj BOTH reference `it`, so the
        # unmaterialized loop recomputed iteration k's subtree 2^(4-k)
        # times (16× for pass 1 on a 5-row frame: 11.9 s of pure plan
        # re-execution → ~2 s).
        it = truncate(
            raw.crossJoin(F.broadcast(norm)).select(
                "t", (F.col("w") * F.col("_k") / F.col("_s")).alias("w")
            )
        )
    final = it.select("t", F.col("w").alias("_strength"))
    return (
        wins.join(final, "t")
        .select(
            F.col("t").alias("event_type"),
            F.col("n_comp").alias("comparisons"),
            F.col("W").alias("wins"),
            F.round("_strength", 6).alias("strength"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R568 — CTT item analysis (difficulty + point-biserial)
# ===========================================================================

@register(
    "q_item_analysis",
    f"""
    WITH solved AS (
      SELECT user_id, event_type,
             MAX(CASE WHEN value > {_IA_SOLVE_MIN} THEN 1 ELSE 0 END)
               AS x
      FROM events GROUP BY 1, 2
    ),
    scores AS (
      SELECT user_id, CAST(SUM(x) AS BIGINT) AS s
      FROM solved GROUP BY 1
    ),
    pop AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS ssum,
             CAST(SUM(s * s) AS BIGINT) AS ssq
      FROM scores
    ),
    item AS (
      SELECT sv.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(sv.x) AS BIGINT) AS n1,
             CAST(SUM(sv.x * sc.s) AS BIGINT) AS s1
      FROM solved sv JOIN scores sc ON sc.user_id = sv.user_id
      GROUP BY 1
    )
    SELECT event_type, n_users,
           round(CAST(n1 AS DOUBLE) / n_users, 6) AS difficulty,
           round(
             (CAST(s1 AS DOUBLE) / NULLIF(n1, 0)
              - CAST(ssum - s1 AS DOUBLE) / NULLIF(n_users - n1, 0))
             / sqrt(CAST(ssq AS DOUBLE) / n
                    - (CAST(ssum AS DOUBLE) / n)
                      * (CAST(ssum AS DOUBLE) / n))
             * sqrt((CAST(n1 AS DOUBLE) / n_users)
                    * (1.0 - CAST(n1 AS DOUBLE) / n_users)), 6)
             AS point_biserial
    FROM item CROSS JOIN pop
    ORDER BY event_type
    """,
)
def q_item_analysis(spark, sf_dir):
    """R568 — per item (event type): difficulty = P(user solved it:
    ≥1 event with value > 600) and point-biserial discrimination
    r_pb = (M₁−M₀)/σ_S·√(p(1−p)) vs the user's total solved count
    (population σ).  Two bounded collapses; exact integer folds."""
    ev = read_events(spark, sf_dir)
    solved = ev.groupBy("user_id", "event_type").agg(
        F.max(
            F.when(F.col("value") > _IA_SOLVE_MIN, 1).otherwise(0)
        ).alias("x")
    )
    scores = solved.groupBy("user_id").agg(F.sum("x").alias("s"))
    pop = scores.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("ssum"),
        F.sum(F.col("s") * F.col("s")).alias("ssq"),
    )
    item = (
        solved.join(scores, "user_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("x").alias("n1"),
            F.sum(F.col("x") * F.col("s")).alias("s1"),
        )
    )
    p = F.col("n1").cast("double") / F.col("n_users")
    m1 = F.col("s1").cast("double") / F.nullif(F.col("n1"), F.lit(0))
    m0 = (F.col("ssum") - F.col("s1")).cast("double") / F.nullif(
        F.col("n_users") - F.col("n1"), F.lit(0)
    )
    mean_s = F.col("ssum").cast("double") / F.col("n")
    sd = F.sqrt(F.col("ssq").cast("double") / F.col("n") - mean_s * mean_s)
    return (
        item.crossJoin(F.broadcast(pop))
        .select(
            "event_type",
            "n_users",
            F.round(p, 6).alias("difficulty"),
            F.round((m1 - m0) / sd * F.sqrt(p * (1.0 - p)), 6).alias(
                "point_biserial"
            ),
        )
        .orderBy("event_type")
    )
