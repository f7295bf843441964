"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``arrow_supercluster_spark``; this module is a
thin adapter over its query registry (arrow_supercluster_spark/plans/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arrow_supercluster_spark.plans.registry import REGISTRY  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: derive deterministic points from sf0.001 customer,
    run the load path (null-drop → Mercator+f32 → grid clustering) at z=4
    and return ClusterOutput-shaped rows (SURVEY.md §7 Phase 0)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from arrow_supercluster_spark.config import DEFAULT_OPTIONS
    from arrow_supercluster_spark.operators.grid_cluster import (
        cluster_grid,
        finalize_clusters,
    )
    from arrow_supercluster_spark.sources.points import derived_points

    pts = derived_points(spark, SF_SMOKE)
    nodes = cluster_grid(pts, zoom=4, opts=DEFAULT_OPTIONS)
    return finalize_clusters(nodes)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)
        return run

    return {name: wrap(qd.spark) for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
