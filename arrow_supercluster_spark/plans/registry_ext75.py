"""Round-2 registry additions, batch 70 — batched viewport serving and
tile manifests (reference-core extensions):

- q_multi_bbox: getClusters for a LIST of viewports in ONE query —
  batch tile/viewport serving (N sequential reference calls become one
  plan over the persisted hierarchy);
- q_tile_counts: the slippy-map tile manifest — point counts per true
  web-mercator z/x/y tile at zoom 4 (what a tile server pre-computes
  to skip empty tiles).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.functions import projection as proj
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry_core import _SQL_XY, _points_xy, register
from arrow_supercluster_spark.sources.points import SQL_POINTS

# three viewports over the point strip (q_get_clusters' bbox, split)
_VIEWPORTS = [
    (1, -180.0, -50.0, -178.0, 0.0),
    (2, -180.0, 0.0, -176.0, 55.0),
    (3, -179.0, -30.0, -176.5, 30.0),
]
_MB_ZOOM = 6


@register(
    "q_multi_bbox",
    f"""
    WITH nodes AS (
      SELECT zoom, cell_x, cell_y, num_points,
             num_points >= {OPTS.min_points} AS is_cluster,
             CASE WHEN num_points >= {OPTS.min_points}
                  THEN {proj.sql_x_lng("(sum_x / num_points)")} ELSE min_lng END AS lng,
             CASE WHEN num_points >= {OPTS.min_points}
                  THEN {proj.sql_y_lat("(sum_y / num_points)")} ELSE min_lat END AS lat
      FROM ({gc.sql_cell_agg(_SQL_XY, _MB_ZOOM, OPTS)})
    )
    {" UNION ALL ".join(
        f'''SELECT {qid} AS viewport, cell_x, cell_y, num_points, is_cluster,
            round(lng, 5) AS lng, round(lat, 5) AS lat
            FROM nodes
            WHERE lng BETWEEN {a!r} AND {c!r} AND lat BETWEEN {b!r} AND {d!r}'''
        for qid, a, b, c, d in _VIEWPORTS
    )}
    """,
)
def q_multi_bbox(spark, sf_dir):
    """Q1 extension — BATCHED getClusters: three viewports answered by
    ONE plan over the zoom-{z} nodes (a broadcast viewport table joined
    on the bbox containment), where the reference answers them as N
    sequential engine calls (arrow-cluster-engine.ts:126-193 ×N). At
    serving scale this is the difference between N hierarchy scans and
    one: the node table scans once, every viewport reads its slice;
    overlapping viewports correctly repeat rows (tagged by viewport
    id).""".format(z=_MB_ZOOM)
    nodes = gc.finalize_clusters(
        gc.cluster_grid(_points_xy(spark, sf_dir), _MB_ZOOM, OPTS, prepared=True),
        OPTS,
    )
    vps = spark.createDataFrame(
        _VIEWPORTS, "viewport int, a double, b double, c double, d double"
    )
    return (
        nodes.join(
            F.broadcast(vps),
            F.col("lng").between(F.col("a"), F.col("c"))
            & F.col("lat").between(F.col("b"), F.col("d")),
        )
        .select(
            "viewport", "cell_x", "cell_y", "num_points", "is_cluster",
            F.round("lng", 5).alias("lng"),
            F.round("lat", 5).alias("lat"),
        )
    )


_TILE_Z = 4


@register(
    "q_tile_counts",
    f"""
    WITH xy AS (SELECT x, y FROM ({_SQL_XY})),
    tiles AS (
      SELECT least(CAST(floor(x * {1 << _TILE_Z}) AS BIGINT), {(1 << _TILE_Z) - 1})
               AS tile_x,
             least(CAST(floor(y * {1 << _TILE_Z}) AS BIGINT), {(1 << _TILE_Z) - 1})
               AS tile_y,
             COUNT(*) AS n
      FROM xy GROUP BY 1, 2
    )
    SELECT {_TILE_Z} AS z, tile_x, tile_y, n FROM tiles
    """,
)
def q_tile_counts(spark, sf_dir):
    """Tile serving — the slippy-map MANIFEST at z={z}: point counts per
    true web-mercator z/x/y tile (floor of the [0,1) mercator coords ×
    2^z — the actual XYZ tiling scheme, distinct from the radius-scaled
    cluster cells). A tile server precomputes exactly this to 404 empty
    tiles without touching storage; it is one narrow key projection +
    one ≤4^z-key agg over the already-projected points.""".format(z=_TILE_Z)
    pts = _points_xy(spark, sf_dir)
    n_tiles = 1 << _TILE_Z
    tx = F.least(
        F.floor(F.col("x") * n_tiles).cast("long"), F.lit(n_tiles - 1)
    )
    ty = F.least(
        F.floor(F.col("y") * n_tiles).cast("long"), F.lit(n_tiles - 1)
    )
    return (
        pts.groupBy(tx.alias("tile_x"), ty.alias("tile_y"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(_TILE_Z).alias("z"), "tile_x", "tile_y", "n")
    )
