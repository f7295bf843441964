"""WKB point decode (P1 non-GeoArrow fallback, arrow-helpers.ts:52-62).

The decoder must be bit-exact: fixtures are packed with struct.pack
(independent of the expression arithmetic) and compared with ==, not
approx.
"""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
import struct

import pytest
from pyspark.sql import functions as F

from arrow_supercluster_spark.functions.wkb import decode_wkb_points, wkb_point_coord


def le_point(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)


def be_point(x, y):
    return struct.pack(">BIdd", 0, 1, x, y)


def ewkb_point_srid(x, y, srid=4326):
    return struct.pack("<BIIdd", 1, 0x20000001, srid, x, y)


COORDS = [
    (-122.419416, 37.774929),
    (179.9999999, -85.0511287),
    (0.0, 0.0),
    (-0.0, 90.0),
    (1e-310, -1e-310),  # denormals — exp==0 branch
    (math.pi, -math.e),
]


def _decode(spark, blobs):
    df = spark.createDataFrame([(b,) for b in blobs], "geometry binary")
    return [
        (r.lng, r.lat)
        for r in decode_wkb_points(df).select("lng", "lat").collect()
    ]


def test_wkb_little_endian_bit_exact(spark):
    got = _decode(spark, [le_point(x, y) for x, y in COORDS])
    assert got == COORDS


def test_wkb_big_endian_bit_exact(spark):
    got = _decode(spark, [be_point(x, y) for x, y in COORDS])
    assert got == COORDS


def test_ewkb_srid_skipped(spark):
    got = _decode(spark, [ewkb_point_srid(x, y) for x, y in COORDS[:3]])
    assert got == COORDS[:3]


def test_wkb_bad_rows_are_null(spark):
    linestring = struct.pack("<BII", 1, 2, 0)  # type 2 = LineString
    truncated = le_point(1.0, 2.0)[:12]
    got = _decode(spark, [linestring, truncated, None])
    assert got == [(None, None)] * 3


def test_wkb_nan_inf_ride_to_null_drop(spark):
    from arrow_supercluster_spark.operators.filters import drop_null_geometry

    df = spark.createDataFrame(
        [(le_point(float("nan"), 1.0),), (le_point(float("inf"), 2.0),), (le_point(3.0, 4.0),)],
        "geometry binary",
    )
    out = decode_wkb_points(df)
    # inf decodes to NaN by design (reference NaN-fills unreadable rows)
    kept = drop_null_geometry(out).collect()
    assert [(r.lng, r.lat) for r in kept] == [(3.0, 4.0)]


def test_read_geoparquet_wkb_fixture(spark, tmp_path):
    """A WKB-encoded GeoParquet file (the in-the-wild encoding) reads
    straight into flat lng/lat through read_geoparquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from arrow_supercluster_spark.sources.geoparquet import read_geoparquet

    path = str(tmp_path / "wkb_points")
    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "geometry": pa.array(
                [le_point(10.5, -20.25), be_point(-30.125, 40.0), None],
                pa.binary(),
            ),
        }
    )
    import os

    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, f"{path}/part-0.parquet")
    got = {
        r.id: (r.lng, r.lat)
        for r in read_geoparquet(spark, path).select("id", "lng", "lat").collect()
    }
    assert got == {1: (10.5, -20.25), 2: (-30.125, 40.0), 3: (None, None)}


def test_wkb_registry_query_matches_oracle(spark):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from tests.oracle_harness import compare, duck_connection

    qd = REGISTRY["q_unpack_wkb"]
    con = duck_connection("/root/testdata/sf0.001")
    errs = compare(
        "q_unpack_wkb", qd.spark(spark, "/root/testdata/sf0.001"), con, qd.sql
    )
    assert not errs, errs
