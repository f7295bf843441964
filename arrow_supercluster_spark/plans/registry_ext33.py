"""Round-2 registry additions, batch 28 — cluster footprints, temporal
nearest-neighbor joins, and model-eval confusion:

- q_cluster_hulls: DBSCAN cluster footprint polygons (per-cluster
  convex hull + shoelace area) — the "draw the cluster on the map"
  operator (rows-only; per-group geometry, tested vs pure Python);
- q_nearest_event: nearest-in-time join (each error to its closest
  same-user click, before OR after — the bidirectional as-of);
- q_lang_confusion: confusion matrix of declared vs detected language
  with per-cell recall share — the classifier-eval readout over
  q_lang_id's detector.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import textops
from arrow_supercluster_spark.operators.dbscan import dbscan
from arrow_supercluster_spark.operators.hull import monotone_chain
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _SQL_LANG_CASE, _SQL_LANG_SCORES
from arrow_supercluster_spark.sources.points import derived_points
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Cluster footprint hulls
# ===========================================================================

_CH_EPS, _CH_MINPTS = 2.0, 4


@register("q_cluster_hulls", None)
def q_cluster_hulls(spark, sf_dir):
    """Geo composition — cluster footprints: DBSCAN labels (eps=2,
    minPts=4), then per-cluster convex hull + shoelace area/perimeter
    inside ONE applyInPandas keyed by cluster id (each group's geometry
    is sequential by nature; groups are independent and distribute).
    Noise is excluded. Rows-only (per-group computational geometry);
    parity vs a pure-Python per-cluster hull in tests/test_batch28.py."""
    pts = derived_points(spark, sf_dir).filter(F.col("lng").isNotNull()).select(
        "id", "lng", "lat"
    )
    labels = dbscan(pts, eps=_CH_EPS, min_pts=_CH_MINPTS).filter(
        F.col("cluster") >= 0
    )
    labeled = pts.join(labels.select("id", "cluster"), "id")

    def per_cluster(key, pdf: pd.DataFrame) -> pd.DataFrame:
        hull = monotone_chain(list(zip(pdf["lng"], pdf["lat"])))
        area = 0.0
        perim = 0.0
        n = len(hull)
        if n >= 3:
            for i in range(n):
                x1, y1 = hull[i]
                x2, y2 = hull[(i + 1) % n]
                area += x1 * y2 - x2 * y1
                perim += ((x2 - x1) ** 2 + (y2 - y1) ** 2) ** 0.5
            area = abs(area) / 2.0
        elif n == 2:
            (x1, y1), (x2, y2) = hull
            perim = 2.0 * ((x2 - x1) ** 2 + (y2 - y1) ** 2) ** 0.5
        return pd.DataFrame(
            {
                "cluster": [int(key[0])],
                "n_points": [len(pdf)],
                "hull_size": [n],
                "area": [round(area, 6)],
                "perimeter": [round(perim, 6)],
            }
        )

    return labeled.groupBy("cluster").applyInPandas(
        per_cluster,
        schema="cluster long, n_points long, hull_size int, area double, perimeter double",
    )


# ===========================================================================
# Nearest-in-time event join
# ===========================================================================

@register(
    "q_nearest_event",
    """
    WITH s AS (
      SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
      WHERE event_type IN ('error', 'click')
    ),
    w AS (
      SELECT *,
             MAX(CASE WHEN event_type = 'click' THEN us END) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_click,
             MIN(CASE WHEN event_type = 'click' THEN us END) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_click
      FROM s
    )
    SELECT event_id, user_id,
           CASE
             WHEN prev_click IS NULL AND next_click IS NULL THEN NULL
             WHEN prev_click IS NULL THEN next_click - us
             WHEN next_click IS NULL THEN us - prev_click
             WHEN us - prev_click <= next_click - us THEN us - prev_click
             ELSE next_click - us
           END AS gap_us
    FROM w WHERE event_type = 'error'
    """,
)
def q_nearest_event(spark, sf_dir):
    """Temporal joins — NEAREST-in-time match (bidirectional as-of): for
    every error, the time gap to the closest same-user click, before or
    after. The classic as-of join (operators/asof.py) looks only
    backward; nearest needs a forward pass too — both are frame-bounded
    windows over the user-partitioned stream (one shuffle keyed by
    user), a running max of click times and its mirror. Ties at equal
    distance resolve to the earlier click (<=) in both engines; integer
    µs throughout, so the comparison is exact."""
    ev = read_events(spark, sf_dir).filter(
        F.col("event_type").isin("error", "click")
    ).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    click_us = F.when(F.col("event_type") == "click", F.col("us"))
    base = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev_click = F.max(click_us).over(
        base.rowsBetween(Window.unboundedPreceding, -1)
    )
    next_click = F.min(click_us).over(
        base.rowsBetween(1, Window.unboundedFollowing)
    )
    w = ev.select(
        "event_id", "user_id", "event_type", "us",
        prev_click.alias("prev_click"), next_click.alias("next_click"),
    )
    back = F.col("us") - F.col("prev_click")
    fwd = F.col("next_click") - F.col("us")
    gap = (
        F.when(F.col("prev_click").isNull() & F.col("next_click").isNull(), F.lit(None))
        .when(F.col("prev_click").isNull(), fwd)
        .when(F.col("next_click").isNull(), back)
        .when(back <= fwd, back)
        .otherwise(fwd)
    )
    return (
        w.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", gap.cast("long").alias("gap_us"))
    )


# ===========================================================================
# Language confusion matrix
# ===========================================================================

@register(
    "q_lang_confusion",
    f"""
    WITH pred AS (
      SELECT doc_id, lang AS true_lang, {_SQL_LANG_CASE} AS pred_lang
      FROM (
        SELECT doc_id, lang,
               {', '.join(f's_{l}' for l in sorted(textops.STOPWORDS))},
               greatest({', '.join(f's_{l}' for l in sorted(textops.STOPWORDS))}) AS best
        FROM (SELECT doc_id, lang, {_SQL_LANG_SCORES} FROM documents) t
      ) s
    ),
    cell AS (
      SELECT true_lang, pred_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2
    ),
    tot AS (SELECT true_lang, SUM(n) AS n_true FROM cell GROUP BY 1)
    SELECT c.true_lang, c.pred_lang, c.n,
           round(c.n * 1.0 / t.n_true, 6) AS recall_share
    FROM cell c JOIN tot t USING (true_lang)
    """,
)
def q_lang_confusion(spark, sf_dir):
    """Model eval — confusion matrix of declared vs detected language
    (q_lang_id's stopword-vote detector) with per-cell recall share:
    the quality readout for any classifier-shaped curation signal. One
    narrow detection pass (in-row HOFs), one (true, pred)-keyed agg on
    ≤|langs|² cells, totals broadcast back."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = docs.select(
        F.col("lang").alias("true_lang"),
        textops.lang_id_expr(F.col("text")).alias("pred_lang"),
    )
    cell = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cell.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    return cell.join(F.broadcast(tot), "true_lang").select(
        "true_lang", "pred_lang", "n",
        F.round(F.col("n") * 1.0 / F.col("n_true"), 6).alias("recall_share"),
    )
