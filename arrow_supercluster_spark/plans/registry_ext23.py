"""Round-2 registry additions, batch 18 — spatial k-NN and customer
segmentation:

- q_geo_knn: k nearest points for a broadcast query set (the spatial
  twin of cosine top-k; same two-phase WindowGroupLimit ranking);
- q_rfm_segments: recency/frequency/monetary quartile segmentation —
  the classic CRM composition of window ntiles over per-user aggs.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Spatial k-NN
# ===========================================================================

_KNN_K = 5
_KNN_NQ = 8  # query points: ids 0..7 (non-null ones)


@register(
    "q_geo_knn",
    f"""
    WITH pts AS (
      SELECT id, lng, lat FROM ({SQL_POINTS})
      WHERE lng IS NOT NULL AND lat IS NOT NULL
    ),
    q AS (SELECT id AS q_id, lng AS qlng, lat AS qlat FROM pts
          WHERE id < {_KNN_NQ}),
    scored AS (
      SELECT q.q_id, p.id,
             round((p.lng - q.qlng) * (p.lng - q.qlng)
                   + (p.lat - q.qlat) * (p.lat - q.qlat), 6) AS d2
      FROM pts p CROSS JOIN q
      WHERE p.id <> q.q_id
    )
    SELECT q_id, id, d2, rk FROM (
      SELECT q_id, id, d2,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d2, id) AS rk
      FROM scored
    ) WHERE rk <= {_KNN_K}
    """,
)
def q_geo_knn(spark, sf_dir):
    """Geo depth — spatial k-nearest-neighbor join: the {k} nearest
    points to each of {nq} broadcast query points (planar squared
    degrees; the haversine operator swaps in for meters). Identical
    two-phase shape to cosine_topk: broadcast query side, narrow
    scoring, WindowGroupLimit partial top-k before the per-query rank —
    no per-query hot reducer. At full scale the cell-bucketed
    radius-cluster join (operators/radius_cluster.py) is the index-side
    prune; this is the exact checked kernel."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    ).select("id", "lng", "lat")
    q = pts.filter(F.col("id") < _KNN_NQ).select(
        F.col("id").alias("q_id"),
        F.col("lng").alias("qlng"),
        F.col("lat").alias("qlat"),
    )
    scored = pts.crossJoin(F.broadcast(q)).filter(
        F.col("id") != F.col("q_id")
    )
    d2 = F.round(
        (F.col("lng") - F.col("qlng")) * (F.col("lng") - F.col("qlng"))
        + (F.col("lat") - F.col("qlat")) * (F.col("lat") - F.col("qlat")),
        6,
    )
    w = Window.partitionBy("q_id").orderBy(F.col("d2"), F.col("id"))
    return (
        scored.select("q_id", "id", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KNN_K)
        .select("q_id", "id", "d2", "rk")
    )


# ===========================================================================
# RFM segmentation
# ===========================================================================

_RFM_ANCHOR = "2024-02-01"


@register(
    "q_rfm_segments",
    f"""
    WITH per_user AS (
      SELECT user_id,
             (epoch_us(TIMESTAMP '{_RFM_ANCHOR}') - MAX(epoch_us(ts)))
               // 86400000000 AS recency_days,
             COUNT(*) AS frequency,
             round(SUM(value), 4) AS monetary
      FROM events GROUP BY 1
    )
    SELECT user_id, recency_days, frequency, monetary,
           NTILE(4) OVER (ORDER BY recency_days, user_id) AS r_q,
           NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
           NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
    FROM per_user
    """,
)
def q_rfm_segments(spark, sf_dir):
    """Event analytics — RFM segmentation (recency / frequency /
    monetary quartiles, the classic CRM scoring): one user-keyed agg
    collapses the stream, then three quartile assignments on the
    |users|-sized table — user-id tiebreaks make every boundary
    deterministic. Each quartile is a distributed zip_scan rank +
    closed-form NTILE (functions/distrank.py, VERDICT r3 de-weak) —
    identical buckets to the SQL twin's NTILE with no unpartitioned
    window; recency in whole days via integer µs division."""
    from arrow_supercluster_spark.functions.distrank import (
        ntile_bucket,
        zip_scan,
    )

    ev = read_events(spark, sf_dir)
    anchor_us = F.unix_micros(F.to_timestamp(F.lit(_RFM_ANCHOR)))
    per_user = ev.groupBy("user_id").agg(
        ((anchor_us - F.max(F.unix_micros("ts"))) / F.lit(86400000000))
        .cast("long")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 4).alias("monetary"),
    )
    r_rk, n, _ = zip_scan(per_user, ["recency_days", "user_id"], out="_r")
    f_rk, _, _ = zip_scan(
        per_user.select("user_id", "frequency"),
        [F.col("frequency").desc(), "user_id"],
        out="_f",
    )
    m_rk, _, _ = zip_scan(
        per_user.select("user_id", "monetary"),
        [F.col("monetary").desc(), "user_id"],
        out="_m",
    )
    return (
        r_rk.join(f_rk.select("user_id", "_f"), "user_id")
        .join(m_rk.select("user_id", "_m"), "user_id")
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary",
            ntile_bucket(F.col("_r"), n, 4).alias("r_q"),
            ntile_bucket(F.col("_f"), n, 4).alias("f_q"),
            ntile_bucket(F.col("_m"), n, 4).alias("m_q"),
        )
    )
