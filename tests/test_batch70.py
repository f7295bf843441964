"""Batch-70 tests: multi-bbox ≡ per-viewport getClusters, tile-count
conservation."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry import REGISTRY, _points_xy
from arrow_supercluster_spark.plans.registry_ext75 import _VIEWPORTS, _MB_ZOOM


def test_multi_bbox_equals_per_viewport(spark, sf_dir):
    batched = REGISTRY["q_multi_bbox"].spark(spark, sf_dir).collect()
    nodes = gc.finalize_clusters(
        gc.cluster_grid(_points_xy(spark, sf_dir), _MB_ZOOM, OPTS, prepared=True),
        OPTS,
    )
    for qid, a, b, c, d in _VIEWPORTS:
        single = {
            (r.cell_x, r.cell_y)
            for r in nodes.filter(
                F.col("lng").between(a, c) & F.col("lat").between(b, d)
            ).collect()
        }
        got = {(r.cell_x, r.cell_y) for r in batched if r.viewport == qid}
        assert got == single, qid
    assert batched  # at least one viewport is non-empty


def test_tile_counts_conservation(spark, sf_dir):
    rows = REGISTRY["q_tile_counts"].spark(spark, sf_dir).collect()
    n_pts = _points_xy(spark, sf_dir).count()
    assert sum(r.n for r in rows) == n_pts
    for r in rows:
        assert r.z == 4
        assert 0 <= r.tile_x < 16 and 0 <= r.tile_y < 16
    # the strip corpus occupies the x=0 tile column only
    assert {r.tile_x for r in rows} == {0}
    assert len({r.tile_y for r in rows}) > 1
