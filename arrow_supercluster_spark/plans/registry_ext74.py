"""Round-2 registry additions, batch 69 — group-wise spatial summaries:

- q_city_extents: per-city bounding box, centroid, and point count —
  the group-wise form of A6's global bbox aggregate (the per-label
  extent table a layer uses to fit viewports per selection).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points


@register(
    "q_city_extents",
    f"""
    SELECT city,
           COUNT(*) AS n,
           MIN(lng) AS min_lng, MAX(lng) AS max_lng,
           MIN(lat) AS min_lat, MAX(lat) AS max_lat,
           round(AVG(lng), 6) AS centroid_lng,
           round(AVG(lat), 6) AS centroid_lat
    FROM ({SQL_POINTS})
    WHERE lng IS NOT NULL AND lat IS NOT NULL
    GROUP BY city
    """,
)
def q_city_extents(spark, sf_dir):
    """Geo — per-city extents: bbox, centroid, and count per label (the
    group-wise form of A6's global bbox agg; the viewport-fitting table
    a selection UI reads — pick city_7, fly to its box). One partial
    agg keyed by the 20-label dimension; min/max are exact, centroids
    round to 6 (mean summation order)."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    )
    return pts.groupBy("city").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lng").alias("min_lng"), F.max("lng").alias("max_lng"),
        F.min("lat").alias("min_lat"), F.max("lat").alias("max_lat"),
        F.round(F.avg("lng"), 6).alias("centroid_lng"),
        F.round(F.avg("lat"), 6).alias("centroid_lat"),
    )
