"""Round-7 registry additions, batch 205 — the GLM everyone fits first,
plus two ordinal effect sizes:

- q_logistic_irls: logistic regression of "user has a high-value
  purchase" on scaled click/view counts — FOUR unrolled Newton/IRLS
  steps (the q_huber_mean unrolled-aggregation-pass discipline): each
  step is one aggregation pass collecting the 6 unique X'WX entries +
  3 gradient sums, then a closed-form 3×3 Cramer solve.  The SQL twin
  is rendered by the same Python loop.  Ships β, train log-loss, and
  0.5-threshold accuracy.
- q_cliffs_delta: Cliff's δ = (P[X>Y] − P[X<Y]) between the user-parity
  arms' purchase values, via per-arm cumulative counts on the merged
  value-collapsed frame (exact integers), with Romano's magnitude
  label.
- q_somers_d: Somers' D_yx of value predicting the evening bit
  (hour ≥ 18) — (C−D)/(n₁n₀) with x-ties contributing zero; the
  ordinal-association completion of the AUC family (D = 2·AUC − 1).

At 100 TB: logistic is 4 aggregation passes over the user frame (all
partial-aggregated, no collect); the effect sizes run on the
value-collapsed cent frame with the allowlisted domain-bounded
running-count window.  Features and counts are exact integers; the
sigmoid/exp chain evaluates identical doubles in both engines.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_LR_ITERS = 4
_LR_VALUE_MIN = 90.0
_CD_THRESH = ((0.147, "small"), (0.33, "medium"), (0.474, "large"))

_SQL_FEATS = f"""
    feats AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               / 10.0 AS x1,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               / 10.0 AS x2,
             MAX(CASE WHEN event_type = 'purchase'
                       AND value > {_LR_VALUE_MIN}
                      THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY 1
    )
"""


def _det3_sql(m):
    (a, b, c), (d, e, f_), (g, h, i) = m
    return (
        f"(({a}) * (({e}) * ({i}) - ({f_}) * ({h}))"
        f" - ({b}) * (({d}) * ({i}) - ({f_}) * ({g}))"
        f" + ({c}) * (({d}) * ({h}) - ({e}) * ({g})))"
    )


def _logistic_ctes() -> list:
    """The shared Newton CTE chain (feats, it0..itN) — consumed by the
    R611 query here and the R616-R618 model diagnostics
    (registry_ext212)."""
    ctes = [_SQL_FEATS.strip().rstrip(), "it0 AS (SELECT 0.0 AS b0, 0.0 AS b1, 0.0 AS b2)"]
    for t in range(1, _LR_ITERS + 1):
        prev = f"it{t - 1}"
        p = (
            f"1.0 / (1.0 + exp(-({prev}.b0 + {prev}.b1 * feats.x1"
            f" + {prev}.b2 * feats.x2)))"
        )
        ctes.append(
            f"""m{t} AS (
      SELECT SUM(({p}) * (1.0 - ({p}))) AS s00,
             SUM(({p}) * (1.0 - ({p})) * feats.x1) AS s01,
             SUM(({p}) * (1.0 - ({p})) * feats.x2) AS s02,
             SUM(({p}) * (1.0 - ({p})) * feats.x1 * feats.x1) AS s11,
             SUM(({p}) * (1.0 - ({p})) * feats.x1 * feats.x2) AS s12,
             SUM(({p}) * (1.0 - ({p})) * feats.x2 * feats.x2) AS s22,
             SUM(feats.y - ({p})) AS g0,
             SUM((feats.y - ({p})) * feats.x1) AS g1,
             SUM((feats.y - ({p})) * feats.x2) AS g2,
             MAX({prev}.b0) AS b0, MAX({prev}.b1) AS b1,
             MAX({prev}.b2) AS b2
      FROM feats CROSS JOIN {prev}
    )"""
        )
        A = [["s00", "s01", "s02"], ["s01", "s11", "s12"], ["s02", "s12", "s22"]]
        g = ["g0", "g1", "g2"]
        det = _det3_sql(A)
        deltas = []
        for j in range(3):
            mj = [row[:] for row in A]
            for r in range(3):
                mj[r][j] = g[r]
            deltas.append(f"({_det3_sql(mj)}) / ({det})")
        ctes.append(
            f"""it{t} AS (
      SELECT b0 + {deltas[0]} AS b0,
             b1 + {deltas[1]} AS b1,
             b2 + {deltas[2]} AS b2
      FROM m{t}
    )"""
        )
    return ctes


def _logistic_sql() -> str:
    ctes = _logistic_ctes()
    p_final = (
        f"1.0 / (1.0 + exp(-(it{_LR_ITERS}.b0"
        f" + it{_LR_ITERS}.b1 * feats.x1"
        f" + it{_LR_ITERS}.b2 * feats.x2)))"
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           round(MAX(it{_LR_ITERS}.b0), 6) + 0.0 AS beta0,
           round(MAX(it{_LR_ITERS}.b1), 6) + 0.0 AS beta1,
           round(MAX(it{_LR_ITERS}.b2), 6) + 0.0 AS beta2,
           round(AVG(-(feats.y * ln({p_final})
                 + (1 - feats.y) * ln(1.0 - ({p_final})))), 6)
             AS log_loss,
           round(AVG(CASE WHEN (({p_final}) > 0.5) = (feats.y = 1)
                          THEN 1.0 ELSE 0.0 END), 6) AS accuracy
    FROM feats CROSS JOIN it{_LR_ITERS}
    """
    )


def _spark_feats(spark, sf_dir):
    """(user_id, x1, x2, y) — the shared logistic feature frame."""
    ev = read_events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            / 10.0
        ).alias("x1"),
        (
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            )
            / 10.0
        ).alias("x2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > _LR_VALUE_MIN),
                1,
            ).otherwise(0)
        ).alias("y"),
    )


def _sigmoid():
    return 1.0 / (
        1.0
        + F.exp(
            -(
                F.col("b0")
                + F.col("b1") * F.col("x1")
                + F.col("b2") * F.col("x2")
            )
        )
    )


def _spark_beta(feats):
    """The 1-row (b0, b1, b2) frame after the unrolled Newton passes —
    shared with the R616-R618 model diagnostics (registry_ext212)."""

    def det3(m):
        (a, b, c), (d, e, f_), (g, h, i) = m
        return (
            a * (e * i - f_ * h)
            - b * (d * i - f_ * g)
            + c * (d * h - e * g)
        )

    beta = feats.sparkSession.createDataFrame(
        [(0.0, 0.0, 0.0)], "b0 double, b1 double, b2 double"
    )
    for _ in range(_LR_ITERS):
        j = feats.crossJoin(F.broadcast(beta))
        p = _sigmoid()
        w = p * (1.0 - p)
        m = j.agg(
            F.sum(w).alias("s00"),
            F.sum(w * F.col("x1")).alias("s01"),
            F.sum(w * F.col("x2")).alias("s02"),
            F.sum(w * F.col("x1") * F.col("x1")).alias("s11"),
            F.sum(w * F.col("x1") * F.col("x2")).alias("s12"),
            F.sum(w * F.col("x2") * F.col("x2")).alias("s22"),
            F.sum(F.col("y") - p).alias("g0"),
            F.sum((F.col("y") - p) * F.col("x1")).alias("g1"),
            F.sum((F.col("y") - p) * F.col("x2")).alias("g2"),
            F.max("b0").alias("b0"),
            F.max("b1").alias("b1"),
            F.max("b2").alias("b2"),
        )
        A = [
            [F.col("s00"), F.col("s01"), F.col("s02")],
            [F.col("s01"), F.col("s11"), F.col("s12")],
            [F.col("s02"), F.col("s12"), F.col("s22")],
        ]
        g = [F.col("g0"), F.col("g1"), F.col("g2")]
        det = det3(A)
        deltas = []
        for jx in range(3):
            mj = [row[:] for row in A]
            for r in range(3):
                mj[r][jx] = g[r]
            deltas.append(det3(mj) / det)
        beta = m.select(
            (F.col("b0") + deltas[0]).alias("b0"),
            (F.col("b1") + deltas[1]).alias("b1"),
            (F.col("b2") + deltas[2]).alias("b2"),
        )
    return beta


@register("q_logistic_irls", _logistic_sql())
def q_logistic_irls(spark, sf_dir):
    """R611 — logit P(high-value purchaser) ~ clicks/10 + views/10:
    β ← β + (X\'WX)⁻¹X\'(y−p), W = diag(p(1−p)), four unrolled Newton
    passes with the 3×3 solve in closed Cramer form — each pass one
    partial-aggregated scan, no collect, no driver loop."""
    feats = _spark_feats(spark, sf_dir)
    beta = _spark_beta(feats)
    j = feats.crossJoin(F.broadcast(beta))
    p = _sigmoid()
    return j.agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.max("b0"), 6) + 0.0).alias("beta0"),
        (F.round(F.max("b1"), 6) + 0.0).alias("beta1"),
        (F.round(F.max("b2"), 6) + 0.0).alias("beta2"),
        F.round(
            F.avg(
                -(
                    F.col("y") * F.log(p)
                    + (1 - F.col("y")) * F.log(1.0 - p)
                )
            ),
            6,
        ).alias("log_loss"),
        F.round(
            F.avg(
                F.when(
                    (p > 0.5) == (F.col("y") == 1), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("accuracy"),
    )


# ===========================================================================
# R612 — Cliff's delta between the user-parity arms
# ===========================================================================

@register(
    "q_cliffs_delta",
    f"""
    WITH vals AS (
      SELECT user_id % 2 AS arm,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'
    ),
    dv AS (
      SELECT c,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1
      FROM vals GROUP BY 1
    ),
    cum AS (
      SELECT c, c0, c1,
             CAST(SUM(c1) OVER (ORDER BY c) AS BIGINT) AS cum1
      FROM dv
    ),
    tot AS (
      SELECT CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(SUM(c1) AS BIGINT) AS n1
      FROM dv
    ),
    sums AS (
      SELECT CAST(SUM(c0 * (cum1 - c1)) AS BIGINT) AS gt,
             CAST(SUM(c0 * ((SELECT n1 FROM tot) - cum1)) AS BIGINT)
               AS lt
      FROM cum
    )
    SELECT n0, n1,
           round((gt - lt) * 1.0 / (n0 * n1), 6) AS cliffs_delta,
           CASE WHEN abs((gt - lt) * 1.0 / (n0 * n1)) < 0.147
                  THEN 'negligible'
                WHEN abs((gt - lt) * 1.0 / (n0 * n1)) < 0.33
                  THEN 'small'
                WHEN abs((gt - lt) * 1.0 / (n0 * n1)) < 0.474
                  THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM sums CROSS JOIN tot
    """,
)
def q_cliffs_delta(spark, sf_dir):
    """R612 — δ = (#{{x₀>x₁}} − #{{x₀<x₁}})/(n₀n₁) from per-arm
    cumulative counts on the merged value-collapsed frame (the
    domain-bounded allowlisted window class); Romano magnitude
    labels at 0.147/0.33/0.474."""
    ev = read_events(spark, sf_dir)
    vals = ev.filter(F.col("event_type") == "purchase").select(
        F.pmod("user_id", F.lit(2)).alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    dv = vals.groupBy("c").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c1"),
    )
    cum = dv.select(
        "c",
        "c0",
        "c1",
        F.sum("c1").over(Window.orderBy("c")).alias("cum1"),
    )
    tot = dv.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    sums = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("c0") * (F.col("cum1") - F.col("c1"))).alias("gt"),
        F.sum(F.col("c0") * (F.col("n1") - F.col("cum1"))).alias("lt"),
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
    )
    delta = (F.col("gt") - F.col("lt")) * 1.0 / (
        F.col("n0") * F.col("n1")
    )
    return sums.select(
        "n0",
        "n1",
        F.round(delta, 6).alias("cliffs_delta"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# ===========================================================================
# R613 — Somers' D (value predicting the evening bit)
# ===========================================================================

@register(
    "q_somers_d",
    """
    WITH vals AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c,
             CASE WHEN EXTRACT(hour FROM ts) >= 18 THEN 1 ELSE 0 END
               AS y
      FROM events
    ),
    dv AS (
      SELECT c,
             CAST(SUM(y) AS BIGINT) AS p1,
             CAST(SUM(1 - y) AS BIGINT) AS p0
      FROM vals GROUP BY 1
    ),
    cum AS (
      SELECT c, p1, p0,
             CAST(SUM(p0) OVER (ORDER BY c) AS BIGINT) AS cum0
      FROM dv
    ),
    tot AS (
      SELECT CAST(SUM(p1) AS BIGINT) AS n1,
             CAST(SUM(p0) AS BIGINT) AS n0
      FROM dv
    ),
    sums AS (
      SELECT CAST(SUM(p1 * (cum0 - p0)) AS BIGINT) AS conc,
             CAST(SUM(p1 * ((SELECT n0 FROM tot) - cum0)) AS BIGINT)
               AS disc
      FROM cum
    )
    SELECT n1, n0,
           round((conc - disc) * 1.0 / (n1 * n0), 6) AS somers_d,
           round(((conc - disc) * 1.0 / (n1 * n0) + 1.0) / 2.0, 6)
             AS auc_equivalent
    FROM sums CROSS JOIN tot
    """,
)
def q_somers_d(spark, sf_dir):
    """R613 — D_yx = (C−D)/(n₁n₀) of value as an ordinal predictor of
    the evening bit, x-ties contributing zero; AUC = (D+1)/2 shipped
    for the family tie-in.  Same collapsed-frame construction as
    Cliff's δ."""
    ev = read_events(spark, sf_dir)
    vals = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("c"),
        F.when(F.hour("ts") >= 18, 1).otherwise(0).alias("y"),
    )
    dv = vals.groupBy("c").agg(
        F.sum("y").alias("p1"),
        F.sum(1 - F.col("y")).alias("p0"),
    )
    cum = dv.select(
        "c",
        "p1",
        "p0",
        F.sum("p0").over(Window.orderBy("c")).alias("cum0"),
    )
    tot = dv.agg(F.sum("p1").alias("n1"), F.sum("p0").alias("n0"))
    sums = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.col("p1") * (F.col("cum0") - F.col("p0"))).alias(
            "conc"
        ),
        F.sum(F.col("p1") * (F.col("n0") - F.col("cum0"))).alias(
            "disc"
        ),
        F.max("n1").alias("n1"),
        F.max("n0").alias("n0"),
    )
    d = (F.col("conc") - F.col("disc")) * 1.0 / (
        F.col("n1") * F.col("n0")
    )
    return sums.select(
        "n1",
        "n0",
        F.round(d, 6).alias("somers_d"),
        F.round((d + 1.0) / 2.0, 6).alias("auc_equivalent"),
    )
