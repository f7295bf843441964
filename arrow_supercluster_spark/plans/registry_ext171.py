"""Round-7 registry additions, batch 166 — binary-classifier operating
metrics over the deterministic per-user scored frame (the q_auc /
q_calibration / q_lift_chart family; score = user's total event value,
label = any >90 purchase):

- q_confusion_mcc: the confusion matrix at one stated threshold plus
  accuracy, balanced accuracy and Matthews correlation — the
  single-operating-point readout AUC deliberately ignores. MCC's
  four-way product is computed in doubles (a BIGINT product of four
  cell sums overflows int64 at corpus scale).
- q_log_loss: cross-entropy of a fixed-weight logistic probability
  (the q_quality_logit pattern: literal θ/s so both engines compute
  identical probabilities) — the PROPER scoring rule complement to
  the q_brier decomposition.
- q_threshold_metrics: precision / recall / F1 / Youden J at five
  literal thresholds — the operating-point selection table a model
  card ships; division-by-zero cells are NULL in both engines by the
  same CASE rule.

At 100 TB: all three are one groupBy(user) partial aggregation
followed by 1-to-5-row conditional aggregates — no window, no join,
no collect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext55 import (
    _SQL_SCORED,
    _spark_scored,
)

_CM_THRESH = 3300.0
_LL_THETA = 3300.0
_LL_SCALE = 400.0
_TM_THRESHOLDS = (2800.0, 3100.0, 3400.0, 3700.0, 4000.0)


# ===========================================================================
# R495 — confusion matrix + MCC at one operating point
# ===========================================================================

@register(
    "q_confusion_mcc",
    f"""
    WITH {_SQL_SCORED},
    cm AS (
      SELECT
        CAST(SUM(CASE WHEN score > {_CM_THRESH} AND label = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN score > {_CM_THRESH} AND label = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN score <= {_CM_THRESH} AND label = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        CAST(SUM(CASE WHEN score <= {_CM_THRESH} AND label = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored
    )
    SELECT tp, fp, tn, fn,
           round((tp + tn) * 1.0 / (tp + fp + tn + fn), 6) AS accuracy,
           round(0.5 * (tp * 1.0 / (tp + fn) + tn * 1.0 / (tn + fp)), 6)
             AS balanced_accuracy,
           round((tp * 1.0 * tn - fp * 1.0 * fn)
                 / sqrt((tp + fp) * 1.0 * (tp + fn)
                        * (tn + fp) * (tn + fn)), 6) AS mcc
    FROM cm
    """,
)
def q_confusion_mcc(spark, sf_dir):
    """R495 — confusion matrix at score > {t} plus accuracy, balanced
    accuracy and Matthews correlation. The MCC product runs in DOUBLES
    on purpose: four cell counts of ~2.5e7 each (100 TB scale) push
    the BIGINT product past int64; the double path loses nothing at 6
    rounded digits. Plan: one user groupBy then a 1-row conditional
    agg.""".format(t=_CM_THRESH)
    s = _spark_scored(spark, sf_dir)
    pred = F.col("score") > _CM_THRESH
    lab = F.col("label") == 1
    cm = s.agg(
        F.sum(F.when(pred & lab, 1).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when(pred & ~lab, 1).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when(~pred & ~lab, 1).otherwise(0)).cast("long").alias("tn"),
        F.sum(F.when(~pred & lab, 1).otherwise(0)).cast("long").alias("fn"),
    )
    tp, fp = F.col("tp"), F.col("fp")
    tn, fn = F.col("tn"), F.col("fn")
    return cm.select(
        "tp", "fp", "tn", "fn",
        F.round((tp + tn) * 1.0 / (tp + fp + tn + fn), 6).alias("accuracy"),
        F.round(
            0.5 * (tp * 1.0 / (tp + fn) + tn * 1.0 / (tn + fp)), 6
        ).alias("balanced_accuracy"),
        F.round(
            (tp * 1.0 * tn - fp * 1.0 * fn)
            / F.sqrt(
                (tp + fp) * 1.0 * (tp + fn) * (tn + fp) * (tn + fn)
            ),
            6,
        ).alias("mcc"),
    )


# ===========================================================================
# R496 — logistic cross-entropy (log loss)
# ===========================================================================

@register(
    "q_log_loss",
    f"""
    WITH {_SQL_SCORED},
    probs AS (
      SELECT label,
             1.0 / (1.0 + exp(-(score - {_LL_THETA}) / {_LL_SCALE})) AS p
      FROM scored
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           round(-AVG(label * ln(p) + (1 - label) * ln(1 - p)), 6)
             AS log_loss,
           round(AVG(CASE WHEN label = 1 THEN ln(p) END), 6)
             AS avg_pos_logp
    FROM probs
    """,
)
def q_log_loss(spark, sf_dir):
    """R496 — cross-entropy of the fixed-weight logistic probability
    p = σ((score − {t}) / {s}) against the purchase label: the proper
    scoring rule that punishes CONFIDENT mistakes, complementing the
    q_brier decomposition (quadratic) and q_ece (binned). Literal
    θ/s keep both engines' probabilities bit-comparable before the
    6-digit round; scores live within ±10 scale units of θ so p never
    saturates into ln(0). Plan: user groupBy then a 1-row agg.""".format(
        t=_LL_THETA, s=_LL_SCALE
    )
    s = _spark_scored(spark, sf_dir)
    p = 1.0 / (1.0 + F.exp(-(F.col("score") - _LL_THETA) / _LL_SCALE))
    probs = s.select("label", p.alias("p"))
    return probs.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            -F.avg(
                F.col("label") * F.log("p")
                + (1 - F.col("label")) * F.log(1 - F.col("p"))
            ),
            6,
        ).alias("log_loss"),
        F.round(
            F.avg(F.when(F.col("label") == 1, F.log("p"))), 6
        ).alias("avg_pos_logp"),
    )


# ===========================================================================
# R497 — threshold sweep (precision / recall / F1 / Youden J)
# ===========================================================================

_TM_SQL_LIST = ", ".join(str(t) for t in _TM_THRESHOLDS)


@register(
    "q_threshold_metrics",
    f"""
    WITH {_SQL_SCORED},
    th AS (SELECT UNNEST([{_TM_SQL_LIST}]) AS thresh),
    cm AS (
      SELECT th.thresh,
        CAST(SUM(CASE WHEN s.score > th.thresh AND s.label = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN s.score > th.thresh AND s.label = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN s.score <= th.thresh AND s.label = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        CAST(SUM(CASE WHEN s.score <= th.thresh AND s.label = 1
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored s CROSS JOIN th GROUP BY th.thresh
    )
    SELECT thresh, tp, fp, tn, fn,
           CASE WHEN tp + fp > 0
                THEN round(tp * 1.0 / (tp + fp), 6) END AS precision,
           round(tp * 1.0 / (tp + fn), 6) AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1,
           round(tp * 1.0 / (tp + fn) + tn * 1.0 / (tn + fp) - 1, 6)
             AS youden_j
    FROM cm ORDER BY thresh
    """,
)
def q_threshold_metrics(spark, sf_dir):
    """R497 — the operating-point table: precision / recall / F1 /
    Youden J at {k} literal thresholds. Zero-denominator cells (a
    threshold above every score predicts nothing positive) are NULL
    under the same CASE rule in both engines. Plan: the scored frame
    cross-joins a {k}-row literal threshold table (broadcast by
    construction) and partial-aggregates the 4 cells per threshold
    map-side — one shuffle of {k}×4 partial cells.""".format(
        k=len(_TM_THRESHOLDS)
    )
    s = _spark_scored(spark, sf_dir)
    th = spark.createDataFrame(
        [(t,) for t in _TM_THRESHOLDS], "thresh double"
    )
    pred = F.col("score") > F.col("thresh")
    lab = F.col("label") == 1
    cm = (
        s.crossJoin(F.broadcast(th))
        .groupBy("thresh")
        .agg(
            F.sum(F.when(pred & lab, 1).otherwise(0)).cast("long")
            .alias("tp"),
            F.sum(F.when(pred & ~lab, 1).otherwise(0)).cast("long")
            .alias("fp"),
            F.sum(F.when(~pred & ~lab, 1).otherwise(0)).cast("long")
            .alias("tn"),
            F.sum(F.when(~pred & lab, 1).otherwise(0)).cast("long")
            .alias("fn"),
        )
    )
    tp, fp = F.col("tp"), F.col("fp")
    tn, fn = F.col("tn"), F.col("fn")
    return cm.select(
        "thresh", "tp", "fp", "tn", "fn",
        F.when(tp + fp > 0, F.round(tp * 1.0 / (tp + fp), 6))
        .alias("precision"),
        F.round(tp * 1.0 / (tp + fn), 6).alias("recall"),
        F.when(
            2 * tp + fp + fn > 0,
            F.round(2.0 * tp / (2 * tp + fp + fn), 6),
        ).alias("f1"),
        F.round(tp * 1.0 / (tp + fn) + tn * 1.0 / (tn + fp) - 1, 6)
        .alias("youden_j"),
    ).orderBy("thresh")
