"""Batch-36 tests: zero-Exchange bucketed join plan, Z-order pruning for
the scanned box, SQL-interface view coverage."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry import REGISTRY, _points_xy
from arrow_supercluster_spark.plans.registry_ext41 import (
    _Z_XRANGE,
    _Z_YRANGE,
    _Z_ZOOM,
)
from arrow_supercluster_spark.sources.layout import (
    rowgroup_prune_fraction,
    write_zordered_points,
)


def test_bucketed_join_zero_exchange(spark, sf_dir):
    df = REGISTRY["q_bucketed_join"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the join itself must read the bucketed layout with no shuffle;
    # the final 5-row aggregate is the only Exchange allowed
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part[:500]
    assert df.count() == 5


def test_zorder_scan_prunes_rowgroups(spark, sf_dir, tmp_path_factory):
    cells = gc.with_cells(_points_xy(spark, sf_dir), _Z_ZOOM, OPTS)
    path = str(tmp_path_factory.mktemp("zscan")) + "/pts"
    write_zordered_points(cells.select("id", "cell_x", "cell_y"), path)
    frac = rowgroup_prune_fraction(path, _Z_XRANGE, _Z_YRANGE)
    assert frac >= 0.5, frac  # most row groups skippable for the small box


def test_sql_interface_views_cover_all_tables(spark, sf_dir):
    from arrow_supercluster_spark.session import TABLES, register_views

    register_views(spark, sf_dir)
    for t in TABLES:
        assert spark.table(t).count() > 0
