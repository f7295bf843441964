"""Round-2 registry additions, batch 71 — the tile pyramid in one pass:

- q_tile_pyramid: slippy-tile counts at zooms 2/4/6 from ONE scan of
  the projected points (zoom-range cross join — the _nodes_all trick at
  tile granularity): the tile server's full pyramid manifest without
  per-zoom rescans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import _SQL_XY, _points_xy, register

_PYR_ZOOMS = (2, 4, 6)


@register(
    "q_tile_pyramid",
    " UNION ALL ".join(
        f"""
        SELECT {z} AS z,
               least(CAST(floor(x * {1 << z}) AS BIGINT), {(1 << z) - 1}) AS tile_x,
               least(CAST(floor(y * {1 << z}) AS BIGINT), {(1 << z) - 1}) AS tile_y,
               COUNT(*) AS n
        FROM ({_SQL_XY})
        GROUP BY 1, 2, 3
        """
        for z in _PYR_ZOOMS
    ),
)
def q_tile_pyramid(spark, sf_dir):
    """Tile serving — the PYRAMID manifest: counts per z/x/y tile at
    zooms {zs}, computed from ONE scan: points cross-join the broadcast
    zoom list, tile keys are a narrow projection, and a single
    (z, x, y)-keyed agg emits every level (the oracle re-scans per zoom
    — exactly the per-level rescan the Spark plan avoids; the
    cluster-hierarchy load uses the same one-scan discipline at cell
    granularity). At 100 TB the pyramid costs one shuffle keyed by
    ≤Σ4^z tiles, not |zooms| scans.""".format(zs=list(_PYR_ZOOMS))
    pts = _points_xy(spark, sf_dir)
    zooms = spark.createDataFrame([(z,) for z in _PYR_ZOOMS], "z int")
    keyed = pts.crossJoin(F.broadcast(zooms)).select(
        "z",
        F.least(
            F.floor(F.col("x") * F.pow(F.lit(2.0), F.col("z"))).cast("long"),
            F.pow(F.lit(2.0), F.col("z")).cast("long") - 1,
        ).alias("tile_x"),
        F.least(
            F.floor(F.col("y") * F.pow(F.lit(2.0), F.col("z"))).cast("long"),
            F.pow(F.lit(2.0), F.col("z")).cast("long") - 1,
        ).alias("tile_y"),
    )
    return keyed.groupBy("z", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n")
    )
