"""Registry entries (batch 227): driver-checkable queries for the two
§2 rows whose implementations lived only behind pytest — R10 (streaming
grid-cluster feed, streaming/events.py) and R12 (session-layer
memoization, engine.py ClusterLayer).  Both are SQL-backed (VERDICT r8
"Next round" #7): the feed's complete-mode output IS the batch A1-grid
aggregate, and the memoized layer's cached output IS Q1 getClusters —
so the existing grid/getClusters oracle algebra applies verbatim and
neither adds a rows-only entry."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.functions import projection as proj
from arrow_supercluster_spark.plans.registry_cluster import _sql_nodes
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import derived_points

_GRID_STREAM_ZOOM = 6


@register(
    "q_grid_stream",
    f"""
    SELECT zoom, cell_x, cell_y, num_points,
           round(sum_x / num_points, 7) AS cx,
           round(sum_y / num_points, 7) AS cy
    FROM ({_sql_nodes(_GRID_STREAM_ZOOM)})
    """,
)
def q_grid_stream(spark, sf_dir):
    """R10 — live grid-cluster feed (streaming/events.py
    streaming_cluster_counts): the batch A1-grid aggregate expressed over
    a point STREAM (file source, availableNow, complete mode to a memory
    sink).  State is O(occupied cells), hash-partitioned by cell exactly
    like the batch shuffle.  The oracle is the BATCH grid SQL — complete
    mode must converge to it on the same points (the streaming≡batch
    invariant of tests/test_streaming.py, now under the driver's hash
    check too).  Mirrors the reference's live-update layer behavior
    (arrow-cluster-layer.ts:89-106 rebuild-on-data-change, here
    incremental)."""
    from arrow_supercluster_spark.streaming.events import (
        streaming_cluster_counts,
    )

    src = tempfile.mkdtemp(prefix="grid_stream_src_")
    pts = derived_points(spark, sf_dir)
    pts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(pts.schema).parquet(src)
    name = f"grid_stream_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_cluster_counts(stream, zoom=_GRID_STREAM_ZOOM)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    nodes = spark.table(name)
    return nodes.select(
        "zoom", "cell_x", "cell_y", "num_points",
        F.round(F.col("sum_x") / F.col("num_points"), 7).alias("cx"),
        F.round(F.col("sum_y") / F.col("num_points"), 7).alias("cy"),
    )


_MEMO_ZOOM = 6
_WORLD = (-180.0, -85.0, 180.0, 85.0)


def _memo_oracle_sql() -> str:
    a, b, c, d = _WORLD
    cx, cy = "(sum_x / num_points)", "(sum_y / num_points)"
    out_lng = (
        f"CASE WHEN num_points >= {OPTS.min_points} "
        f"THEN {proj.sql_x_lng(cx)} ELSE min_lng END"
    )
    out_lat = (
        f"CASE WHEN num_points >= {OPTS.min_points} "
        f"THEN {proj.sql_y_lat(cy)} ELSE min_lat END"
    )
    return f"""
    SELECT zoom, cell_x, cell_y, num_points, is_cluster,
           round(lng, 5) AS lng, round(lat, 5) AS lat
    FROM (
      SELECT zoom, cell_x, cell_y, num_points,
             num_points >= {OPTS.min_points} AS is_cluster,
             {out_lng} AS lng, {out_lat} AS lat
      FROM ({_sql_nodes(_MEMO_ZOOM)})
    )
    WHERE lng BETWEEN {a!r} AND {c!r} AND lat BETWEEN {b!r} AND {d!r}
    """


@register("q_layer_memo", _memo_oracle_sql())
def q_layer_memo(spark, sf_dir):
    """R12 — session-layer memoization (engine.py ClusterLayer, the
    analog of the reference layer's rebuild/requery/cached state machine,
    arrow-cluster-layer.ts:84-118): set_data builds the hierarchy once;
    two fractional zooms with the same floor hit the SAME cached
    collected output (the zero-new-jobs invariant stays pytest-asserted
    in tests/test_engine.py — this entry puts the served rows under
    the driver's hash check).  Oracle = Q1 getClusters at the floored
    zoom over the world bbox, which is exactly what the cache must hold.
    The collect lives inside ClusterLayer (screen-sized output by
    construction — bounded like every Q1 result)."""
    from arrow_supercluster_spark.engine import ClusterLayer

    layer = ClusterLayer(
        spark, OPTS, workdir=tempfile.mkdtemp(prefix="layer_memo_")
    )
    layer.set_data(derived_points(spark, sf_dir))
    layer.get_clusters(_MEMO_ZOOM + 0.2, _WORLD)  # fills the cache
    rows = layer.get_clusters(_MEMO_ZOOM + 0.7, _WORLD)  # memo hit
    out = spark.createDataFrame(rows)
    return out.select(
        "zoom", "cell_x", "cell_y", "num_points", "is_cluster",
        F.round("lng", 5).alias("lng"),
        F.round("lat", 5).alias("lat"),
    )
