"""Round-7 registry additions, batch 207 — model diagnostics for the
R611 logistic task (the interpretability layer every model report
needs):

- q_information_gain: split-quality ranking of three candidate binary
  features (clicks/views/signups ≥ their user-median): information
  gain H(y) − Σp(f)H(y|f), Gini gain, and the 2×2 χ² — the
  decision-tree root-split table, from exact contingency counts.
- q_partial_dependence: PD of the FITTED R611 model along the clicks
  axis — PD(g) = mean over users of σ(β₀ + β₁g + β₂x2ᵢ) on a literal
  9-point grid; the betas come from the SAME unrolled Newton chain
  (shared CTE list / shared _spark_beta helper).
- q_permutation_importance: feature importance by a DETERMINISTIC
  rank-rotation permutation (feature value of the user at rank r is
  reassigned from rank (r+1) mod n by user_id order — a derangement,
  no RNG): importance = permuted log-loss − base log-loss, per
  feature.  The Spark rank is the distributed zip_scan.

At 100 TB: contingencies and PD are single aggregation passes over
the user feature frame; the permutation is one rank self-join; the
Newton chain stays 4 partial-aggregated passes.  All counts exact;
sigmoid chains evaluate identical doubles in both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext210 import (
    _LR_ITERS,
    _LR_VALUE_MIN,
    _logistic_ctes,
    _spark_beta,
    _spark_feats,
)
from arrow_supercluster_spark.sources.tables import read_events

_PD_GRID = tuple(range(0, 17, 2))  # x1 = clicks/10 axis
_PI_FEATURES = ("x1", "x2")

_SQL_UFEATS = f"""
    ufeats AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
             CAST(SUM(CASE WHEN event_type = 'view'
                           THEN 1 ELSE 0 END) AS BIGINT) AS views,
             CAST(SUM(CASE WHEN event_type = 'signup'
                           THEN 1 ELSE 0 END) AS BIGINT) AS signups,
             MAX(CASE WHEN event_type = 'purchase'
                       AND value > {_LR_VALUE_MIN}
                      THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY 1
    )
"""


# ===========================================================================
# R616 — information gain / Gini gain / chi2 of candidate splits
# ===========================================================================

def _sql_med(col: str) -> str:
    """Type-1 median of ufeats.{col} via the bounded distinct-value
    self-join (2*cum >= n)."""
    return f"""(
      SELECT MIN(v) FROM (
        SELECT a.{col} AS v, CAST(COUNT(*) AS BIGINT) AS cum
        FROM (SELECT DISTINCT {col} FROM ufeats) a
        JOIN ufeats b ON b.{col} <= a.{col}
        GROUP BY 1
      ) c WHERE 2 * cum >= (SELECT COUNT(*) FROM ufeats)
    )"""


@register(
    "q_information_gain",
    f"""
    WITH {_SQL_UFEATS},
    cells AS (
      {' UNION ALL '.join(
          f'''SELECT {name!r} AS feature,
                 CASE WHEN {col} >= {_sql_med(col)} THEN 1 ELSE 0 END
                   AS f, y, CAST(COUNT(*) AS BIGINT) AS n
              FROM ufeats GROUP BY 2, 3'''
          for name, col in (("clicks", "clicks"), ("views", "views"),
                            ("signups", "signups")))}
    ),
    tot AS (
      SELECT feature, CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT)
               AS n1
      FROM cells GROUP BY 1
    ),
    marg AS (
      SELECT feature, f, CAST(SUM(n) AS BIGINT) AS nf,
             CAST(SUM(CASE WHEN y = 1 THEN n ELSE 0 END) AS BIGINT)
               AS nf1
      FROM cells GROUP BY 1, 2
    ),
    ent AS (
      SELECT m.feature,
             SUM((m.nf * 1.0 / t.nt)
                 * (CASE WHEN m.nf1 > 0 AND m.nf1 < m.nf THEN
                     -(m.nf1 * 1.0 / m.nf) * ln(m.nf1 * 1.0 / m.nf)
                     - (1.0 - m.nf1 * 1.0 / m.nf)
                       * ln(1.0 - m.nf1 * 1.0 / m.nf)
                    ELSE 0.0 END)) AS h_cond,
             SUM((m.nf * 1.0 / t.nt)
                 * 2.0 * (m.nf1 * 1.0 / m.nf)
                 * (1.0 - m.nf1 * 1.0 / m.nf)) AS gini_cond,
             SUM(CASE WHEN m.nf > 0 THEN
                   (m.nf1 - m.nf * 1.0 * t.n1 / t.nt)
                   * (m.nf1 - m.nf * 1.0 * t.n1 / t.nt)
                   / (m.nf * 1.0 * t.n1 / t.nt)
                   + ((m.nf - m.nf1)
                      - m.nf * 1.0 * (t.nt - t.n1) / t.nt)
                     * ((m.nf - m.nf1)
                        - m.nf * 1.0 * (t.nt - t.n1) / t.nt)
                     / (m.nf * 1.0 * (t.nt - t.n1) / t.nt)
                  ELSE 0.0 END) AS chi2,
             MAX(t.nt) AS nt, MAX(t.n1) AS n1
      FROM marg m JOIN tot t ON t.feature = m.feature
      GROUP BY 1
    )
    SELECT feature,
           round((CASE WHEN n1 > 0 AND n1 < nt THEN
                   -(n1 * 1.0 / nt) * ln(n1 * 1.0 / nt)
                   - (1.0 - n1 * 1.0 / nt) * ln(1.0 - n1 * 1.0 / nt)
                  ELSE 0.0 END) - h_cond, 6) AS info_gain,
           round(2.0 * (n1 * 1.0 / nt) * (1.0 - n1 * 1.0 / nt)
                 - gini_cond, 6) AS gini_gain,
           round(chi2, 6) AS chi2
    FROM ent ORDER BY feature
    """,
)
def q_information_gain(spark, sf_dir):
    """R616 — per candidate median-split feature: IG = H(y) −
    Σp(f)H(y|f), Gini gain, Pearson χ² (2×2) — the root-split ranking
    a tree learner would compute, from one user collapse + ≤4-cell
    contingencies per feature."""
    ev = read_events(spark, sf_dir)
    ufeats = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("clicks"),
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("views"),
        F.sum(
            F.when(F.col("event_type") == "signup", 1).otherwise(0)
        ).alias("signups"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > _LR_VALUE_MIN),
                1,
            ).otherwise(0)
        ).alias("y"),
    )
    n_users = ufeats.count()  # user collapse: one driver scalar

    parts = []
    for name in ("clicks", "views", "signups"):
        dv = ufeats.select(name).distinct()
        b = ufeats.select(F.col(name).alias("bv"))
        cum = (
            dv.join(b, F.col("bv") <= F.col(name))
            .groupBy(name)
            .agg(F.count(F.lit(1)).alias("cum"))
        )
        med = (
            cum.filter(2 * F.col("cum") >= n_users)
            .agg(F.min(name).alias("med"))
            .collect()[0]["med"]
        )
        cells = ufeats.groupBy(
            F.when(F.col(name) >= med, 1).otherwise(0).alias("f"), "y"
        ).agg(F.count(F.lit(1)).alias("n"))
        parts.append(
            cells.select(F.lit(name).alias("feature"), "f", "y", "n")
        )
    cells = parts[0]
    for p in parts[1:]:
        cells = cells.unionByName(p)
    tot = cells.groupBy("feature").agg(
        F.sum("n").alias("nt"),
        F.sum(F.when(F.col("y") == 1, F.col("n")).otherwise(0)).alias(
            "n1"
        ),
    )
    marg = cells.groupBy("feature", "f").agg(
        F.sum("n").alias("nf"),
        F.sum(F.when(F.col("y") == 1, F.col("n")).otherwise(0)).alias(
            "nf1"
        ),
    )
    pf1 = F.col("nf1") * 1.0 / F.col("nf")
    h_f = F.when(
        (F.col("nf1") > 0) & (F.col("nf1") < F.col("nf")),
        -pf1 * F.log(pf1) - (1.0 - pf1) * F.log(1.0 - pf1),
    ).otherwise(0.0)
    e1 = F.col("nf") * 1.0 * F.col("n1") / F.col("nt")
    e0 = F.col("nf") * 1.0 * (F.col("nt") - F.col("n1")) / F.col("nt")
    chi_f = F.when(
        F.col("nf") > 0,
        (F.col("nf1") - e1) * (F.col("nf1") - e1) / e1
        + ((F.col("nf") - F.col("nf1")) - e0)
        * ((F.col("nf") - F.col("nf1")) - e0)
        / e0,
    ).otherwise(0.0)
    ent = (
        marg.join(F.broadcast(tot), "feature")
        .groupBy("feature")
        .agg(
            F.sum(
                (F.col("nf") * 1.0 / F.col("nt")) * h_f
            ).alias("h_cond"),
            F.sum(
                (F.col("nf") * 1.0 / F.col("nt"))
                * 2.0
                * pf1
                * (1.0 - pf1)
            ).alias("gini_cond"),
            F.sum(chi_f).alias("chi2"),
            F.max("nt").alias("nt"),
            F.max("n1").alias("n1"),
        )
    )
    py = F.col("n1") * 1.0 / F.col("nt")
    h_y = F.when(
        (F.col("n1") > 0) & (F.col("n1") < F.col("nt")),
        -py * F.log(py) - (1.0 - py) * F.log(1.0 - py),
    ).otherwise(0.0)
    return ent.select(
        "feature",
        F.round(h_y - F.col("h_cond"), 6).alias("info_gain"),
        F.round(
            2.0 * py * (1.0 - py) - F.col("gini_cond"), 6
        ).alias("gini_gain"),
        F.round("chi2", 6).alias("chi2"),
    ).orderBy("feature")


# ===========================================================================
# R617 — partial dependence of the fitted logistic model
# ===========================================================================

@register(
    "q_partial_dependence",
    "WITH "
    + ",\n    ".join(_logistic_ctes())
    + f""",
    grid AS (
      SELECT g FROM (VALUES {', '.join(
          f'({g})' for g in _PD_GRID)}) gg(g)
    )
    SELECT g * 1.0 AS x1_value,
           round(AVG(1.0 / (1.0 + exp(-(it{_LR_ITERS}.b0
                 + it{_LR_ITERS}.b1 * g
                 + it{_LR_ITERS}.b2 * feats.x2)))), 6) AS pd
    FROM feats CROSS JOIN it{_LR_ITERS} CROSS JOIN grid
    GROUP BY g ORDER BY x1_value
    """,
)
def q_partial_dependence(spark, sf_dir):
    """R617 — PD(g) = E_users[σ(β₀ + β₁g + β₂x2)] on the literal grid
    g ∈ 0..16 step 2 of the clicks/10 axis, betas from the shared
    unrolled Newton chain — the 1-D model-response curve."""
    feats = _spark_feats(spark, sf_dir)
    beta = _spark_beta(feats)
    grid = spark.createDataFrame([(g,) for g in _PD_GRID], "g INT")
    j = feats.crossJoin(F.broadcast(beta)).crossJoin(
        F.broadcast(grid)
    )
    pd = 1.0 / (
        1.0
        + F.exp(
            -(
                F.col("b0")
                + F.col("b1") * F.col("g")
                + F.col("b2") * F.col("x2")
            )
        )
    )
    return (
        j.groupBy("g")
        .agg(F.round(F.avg(pd), 6).alias("pd"))
        .select((F.col("g") * 1.0).alias("x1_value"), "pd")
        .orderBy("x1_value")
    )


# ===========================================================================
# R618 — deterministic permutation importance
# ===========================================================================

@register(
    "q_permutation_importance",
    "WITH "
    + ",\n    ".join(_logistic_ctes())
    + f""",
    ranked AS (
      SELECT user_id, x1, x2, y,
             row_number() OVER (ORDER BY user_id) AS rk,
             COUNT(*) OVER () AS n
      FROM feats
    ),
    rotated AS (
      SELECT a.user_id, a.x1, a.x2, a.y,
             b.x1 AS px1, b.x2 AS px2
      FROM ranked a JOIN ranked b
        ON b.rk = (a.rk % a.n) + 1
    ),
    losses AS (
      SELECT
        AVG(-(y * ln(1.0 / (1.0 + exp(-(it{_LR_ITERS}.b0
              + it{_LR_ITERS}.b1 * x1 + it{_LR_ITERS}.b2 * x2))))
            + (1 - y) * ln(1.0 - 1.0 / (1.0 + exp(-(it{_LR_ITERS}.b0
              + it{_LR_ITERS}.b1 * x1 + it{_LR_ITERS}.b2 * x2))))))
          AS base_loss,
        AVG(-(y * ln(1.0 / (1.0 + exp(-(it{_LR_ITERS}.b0
              + it{_LR_ITERS}.b1 * px1 + it{_LR_ITERS}.b2 * x2))))
            + (1 - y) * ln(1.0 - 1.0 / (1.0 + exp(-(it{_LR_ITERS}.b0
              + it{_LR_ITERS}.b1 * px1 + it{_LR_ITERS}.b2 * x2))))))
          AS loss_x1,
        AVG(-(y * ln(1.0 / (1.0 + exp(-(it{_LR_ITERS}.b0
              + it{_LR_ITERS}.b1 * x1 + it{_LR_ITERS}.b2 * px2))))
            + (1 - y) * ln(1.0 - 1.0 / (1.0 + exp(-(it{_LR_ITERS}.b0
              + it{_LR_ITERS}.b1 * x1 + it{_LR_ITERS}.b2 * px2))))))
          AS loss_x2
      FROM rotated CROSS JOIN it{_LR_ITERS}
    )
    SELECT 'x1' AS feature, round(base_loss, 6) AS base_loss,
           round(loss_x1, 6) AS permuted_loss,
           round(loss_x1 - base_loss, 6) AS importance
    FROM losses
    UNION ALL
    SELECT 'x2', round(base_loss, 6), round(loss_x2, 6),
           round(loss_x2 - base_loss, 6)
    FROM losses
    ORDER BY feature
    """,
)
def q_permutation_importance(spark, sf_dir):
    """R618 — importance_j = logloss(feature j rotated by one rank
    position, a deterministic derangement) − base logloss, on the
    fitted R611 model.  The rank is zip_scan (distributed); the
    rotation is one equi-join on (rk mod n)+1."""
    from arrow_supercluster_spark.functions.distrank import zip_scan

    feats = _spark_feats(spark, sf_dir)
    beta = _spark_beta(feats)
    ranked, n, _ = zip_scan(feats, ["user_id"], out="_rk0")
    ranked = ranked.withColumn("rk", F.col("_rk0") + 1)
    b = ranked.select(
        F.col("rk").alias("brk"),
        F.col("x1").alias("px1"),
        F.col("x2").alias("px2"),
    )
    rotated = ranked.join(
        b, F.col("brk") == (F.col("rk") % n) + 1
    )

    def loss(x1col, x2col):
        p = 1.0 / (
            1.0
            + F.exp(
                -(
                    F.col("b0")
                    + F.col("b1") * x1col
                    + F.col("b2") * x2col
                )
            )
        )
        return F.avg(
            -(
                F.col("y") * F.log(p)
                + (1 - F.col("y")) * F.log(1.0 - p)
            )
        )

    losses = rotated.crossJoin(F.broadcast(beta)).agg(
        loss(F.col("x1"), F.col("x2")).alias("base_loss"),
        loss(F.col("px1"), F.col("x2")).alias("loss_x1"),
        loss(F.col("x1"), F.col("px2")).alias("loss_x2"),
    )
    r1 = losses.select(
        F.lit("x1").alias("feature"),
        F.round("base_loss", 6).alias("base_loss"),
        F.round("loss_x1", 6).alias("permuted_loss"),
        F.round(F.col("loss_x1") - F.col("base_loss"), 6).alias(
            "importance"
        ),
    )
    r2 = losses.select(
        F.lit("x2").alias("feature"),
        F.round("base_loss", 6).alias("base_loss"),
        F.round("loss_x2", 6).alias("permuted_loss"),
        F.round(F.col("loss_x2") - F.col("base_loss"), 6).alias(
            "importance"
        ),
    )
    return r1.unionByName(r2).orderBy("feature")
