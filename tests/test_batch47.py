"""Batch-47 tests: hex binning geometry, LSH eval floors, fertility
consistency."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.plans.registry_ext52 import _HEX_SIZE
from arrow_supercluster_spark.sources.points import derived_points


def _axial_center(q, r, size):
    x = size * math.sqrt(3.0) * (q + r / 2.0)
    y = size * 1.5 * r
    return x, y


def test_hexbin_points_near_their_hex_center(spark, sf_dir):
    rows = REGISTRY["q_hexbin"].spark(spark, sf_dir).collect()
    n_pts = derived_points(spark, sf_dir).filter(F.col("lng").isNotNull()).count()
    assert sum(r.n for r in rows) == n_pts
    # every bin's mean position lies within one circumradius of the hex center
    for r in rows:
        cx, cy = _axial_center(r.hq, r.hr, _HEX_SIZE)
        d = math.hypot(r.mean_lng - cx, r.mean_lat - cy)
        assert d <= _HEX_SIZE + 1e-6, (r.hq, r.hr, d)


def test_hexbin_assignment_is_nearest_center(spark, sf_dir):
    # sample points: check the assigned hex center is the closest among
    # the point's own hex and its 6 neighbors
    pts = (
        derived_points(spark, sf_dir)
        .filter(F.col("lng").isNotNull())
        .limit(200)
        .collect()
    )
    from arrow_supercluster_spark.plans.registry_ext52 import _hex_cols

    df = spark.createDataFrame([(r.lng, r.lat) for r in pts], "lng double, lat double")
    hq, hr = _hex_cols(F.col("lng"), F.col("lat"))
    assigned = df.select("lng", "lat", hq.alias("q"), hr.alias("r")).collect()
    for row in assigned:
        cx, cy = _axial_center(row.q, row.r, _HEX_SIZE)
        d0 = math.hypot(row.lng - cx, row.lat - cy)
        for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
            nx, ny = _axial_center(row.q + dq, row.r + dr, _HEX_SIZE)
            dn = math.hypot(row.lng - nx, row.lat - ny)
            assert d0 <= dn + 1e-9, (row.q, row.r, dq, dr)


def test_lsh_eval_floors(spark, sf_dir):
    row = REGISTRY["q_lsh_eval"].spark(spark, sf_dir).collect()[0]
    assert row.n_common <= min(row.n_exact, row.n_lsh)
    assert row.precision == 1.0  # LSH verifies candidates exactly
    assert row.recall is None or row.recall >= 0.5


def test_fertility_consistency(spark, sf_dir):
    rows = REGISTRY["q_bpe_fertility"].spark(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.fertility >= 0.99  # merges only shrink; >= 1 unless empty docs
        assert r.n_bpe <= 100 * r.n_words + 1000
