"""Deterministic points source derived from the driver's `customer` table.

The reference consumes GeoParquet point tables produced by a seeded LCG
generator (examples/basic/scripts/generate-geoparquet.ts:85-139, LCG
`seed·16807 % 2^31−1`). The driver testdata has no points table, so we
derive one from `customer` with the SAME LCG recurrence applied to
c_custkey — pure integer arithmetic + one exact double division, so the
DuckDB oracle computes bit-identical values (FIXTURES.md §3 note).

Columns: id (int64), lng/lat (double, ~1% nulls to exercise the null-drop
path F2), city (string, 20 labels for mask/distinct tests F3/A4).

Scale note: this is a narrow projection over the scan — no shuffle, fully
pushed down; at 100 TB it is a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LCG_M = 2147483647  # 2^31 - 1
LCG_A = 16807
NULL_MOD = 97  # every 97th point gets null coordinates (exercises F2)
N_CITIES = 20


def derived_points(spark: SparkSession, sf_dir: str, with_nulls: bool = True) -> DataFrame:
    """customer → (id, lng, lat, city). Deterministic, partition-invariant."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    x1 = (F.col("c_custkey") * LCG_A) % LCG_M
    x2 = (x1 * LCG_A) % LCG_M
    lng = F.lit(-180.0) + F.lit(360.0) * (x1 / F.lit(float(LCG_M)))
    lat = F.lit(-85.0) + F.lit(170.0) * (x2 / F.lit(float(LCG_M)))
    if with_nulls:
        keep = (F.col("c_custkey") % NULL_MOD) != 0
        lng = F.when(keep, lng)
        lat = F.when(keep, lat)
    return cust.select(
        F.col("c_custkey").alias("id"),
        lng.alias("lng"),
        lat.alias("lat"),
        F.concat(F.lit("city_"), (F.col("c_custkey") % N_CITIES).cast("string")).alias("city"),
    )


# SQL twin for the DuckDB oracle — identical arithmetic, identical op order.
SQL_POINTS = f"""
SELECT
  c_custkey AS id,
  CASE WHEN c_custkey % {NULL_MOD} = 0 THEN NULL
       ELSE -180.0 + 360.0 * (((c_custkey * {LCG_A}) % {LCG_M}) / {float(LCG_M)!r}) END AS lng,
  CASE WHEN c_custkey % {NULL_MOD} = 0 THEN NULL
       ELSE -85.0 + 170.0 * ((((c_custkey * {LCG_A}) % {LCG_M}) * {LCG_A} % {LCG_M}) / {float(LCG_M)!r}) END AS lat,
  'city_' || CAST(c_custkey % {N_CITIES} AS VARCHAR) AS city
FROM customer
"""

SQL_POINTS_NONULL = f"""
SELECT
  c_custkey AS id,
  -180.0 + 360.0 * (((c_custkey * {LCG_A}) % {LCG_M}) / {float(LCG_M)!r}) AS lng,
  -85.0 + 170.0 * ((((c_custkey * {LCG_A}) % {LCG_M}) * {LCG_A} % {LCG_M}) / {float(LCG_M)!r}) AS lat,
  'city_' || CAST(c_custkey % {N_CITIES} AS VARCHAR) AS city
FROM customer
"""
