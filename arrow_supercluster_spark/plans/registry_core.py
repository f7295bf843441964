"""Leaf registry core — QueryDef / REGISTRY / register plus the shared
point helpers, with NO imports from plans.registry.

Why a leaf module: every registry_ext* module needs `register` at
import time, and plans.registry's module body both (a) imports all ext
modules and (b) asserts the 50-slot driver window is fully registered.
When a user (or a test file) imports an ext module FIRST, Python begins
that module, recurses into plans.registry, whose loader SKIPS the
in-progress ext module (it's already in sys.modules) — so the window
assert fired on any ext module that owns a window slot (found in round
5 the day q_setsim_join rotated into the window and
`pytest tests/test_batch84.py` stopped importing cleanly standalone).
With `register` living here, ext-module import no longer recurses into
plans.registry at all and the cycle is gone; plans.registry re-exports
everything for compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.sources.points import (
    SQL_POINTS,
    derived_points,
)


@dataclass
class QueryDef:
    spark: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # None ⇒ rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: Optional[str]):
    def deco(fn):
        # a duplicate name would silently OVERWRITE the earlier query and
        # shrink the registry (caught once in round 5) — fail loudly
        assert name not in REGISTRY, f"duplicate registry entry: {name}"
        REGISTRY[name] = QueryDef(spark=fn, sql=sql)
        return fn
    return deco


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return derived_points(spark, sf_dir)


def _points_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gc.prepare_points(derived_points(spark, sf_dir))


_SQL_XY = gc.sql_points_xy(SQL_POINTS)
