"""Web-Mercator projection expressions.

Re-expresses the reference's scalar projection helpers as native Spark SQL
expressions (whole-stage codegen; no UDFs):

  * lng_x / lat_y  — forward projection, mercator.ts:9-18
  * x_lng / y_lat  — inverse projection, mercator.ts:21-29
  * fround         — float32 rounding applied before indexing so cluster
                     coordinates match Supercluster precision
                     (arrow-cluster-engine.ts:94, mercator.ts:6,31)

Formula shapes are kept textually identical to the reference so an ANSI-SQL
oracle (DuckDB) computing the same expression yields bit-identical doubles
for the non-transcendental parts; transcendental outputs are compared after
rounding (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

PI = math.pi


def fround(c: Column) -> Column:
    """JS Math.fround: round-trip through float32
    (arrow-cluster-engine.ts:94)."""
    return c.cast("float").cast("double")


def lng_x(lng: Column) -> Column:
    """lngX(lng) = lng/360 + 0.5  (mercator.ts:9-11)."""
    return lng / F.lit(360.0) + F.lit(0.5)


def lat_y(lat: Column) -> Column:
    """latY(lat) = 0.5 − 0.25·ln((1+sin)/(1−sin))/π, clamped to [0,1]
    (mercator.ts:13-18). Poles short-circuit BEFORE the formula: at
    lat=±90 the (1−sin) denominator is 0 — JS rides the Infinity into the
    clamp, but Spark's default ANSI mode raises DIVIDE_BY_ZERO — so the
    clamp must happen on the input side too.

    Additionally, for lats *inside* (−90, 90) but within ~7e-7 of a pole,
    sin() itself rounds to exactly ±1.0: the north side would divide by
    zero and the south side would take ln(0) (NULL in Spark, −Inf in JS).
    Clamping s to ±(1−1e-15) fixes both: the resulting |y| is ≈ 2.8, far
    outside [0,1], so the output clamp still lands on the same 0/1 the
    reference reaches by riding ±Infinity."""
    s = F.sin(lat * F.lit(PI) / F.lit(180.0))
    s = F.greatest(F.least(s, F.lit(1.0 - 1e-15)), F.lit(-(1.0 - 1e-15)))
    y = F.lit(0.5) - F.lit(0.25) * F.log((F.lit(1.0) + s) / (F.lit(1.0) - s)) / F.lit(PI)
    return (
        F.when(lat >= 90.0, F.lit(0.0))
        .when(lat <= -90.0, F.lit(1.0))
        .when(y < 0.0, F.lit(0.0))
        .when(y > 1.0, F.lit(1.0))
        .otherwise(y)
    )


def x_lng(x: Column) -> Column:
    """xLng(x) = (x − 0.5)·360  (mercator.ts:21-23)."""
    return (x - F.lit(0.5)) * F.lit(360.0)


def y_lat(y: Column) -> Column:
    """yLat(y) = 360·atan(exp((180 − y·360)·π/180))/π − 90
    (mercator.ts:25-29)."""
    y2 = (F.lit(180.0) - y * F.lit(360.0)) * F.lit(PI) / F.lit(180.0)
    return F.lit(360.0) * F.atan(F.exp(y2)) / F.lit(PI) - F.lit(90.0)


def project(df, lng: str = "lng", lat: str = "lat", x: str = "x", y: str = "y"):
    """Forward-project a points DataFrame, with the reference's float32
    rounding applied (load loop, arrow-cluster-engine.ts:93-94)."""
    return df.withColumns(
        {
            x: fround(lng_x(F.col(lng))),
            y: fround(lat_y(F.col(lat))),
        }
    )


# ---------------------------------------------------------------------------
# SQL-string twins (DuckDB oracle): keep operation order IDENTICAL to the
# Column versions above so IEEE-defined ops (+,-,*,/) match bit-exactly.
# ---------------------------------------------------------------------------

def sql_lng_x(lng: str) -> str:
    return f"({lng} / 360.0 + 0.5)"


def sql_lat_y(lat: str) -> str:
    # Same near-pole sin clamp as lat_y (keeps the oracle bit-identical and
    # avoids ln(0)/division-by-zero on lats within ~7e-7 of a pole).
    s = f"greatest(least(sin({lat} * pi() / 180.0), (1.0 - 1e-15)), -(1.0 - 1e-15))"
    y = f"(0.5 - 0.25 * ln((1.0 + {s}) / (1.0 - {s})) / pi())"
    return (
        f"(CASE WHEN {lat} >= 90.0 THEN 0.0 WHEN {lat} <= -90.0 THEN 1.0 "
        f"WHEN {y} < 0.0 THEN 0.0 WHEN {y} > 1.0 THEN 1.0 ELSE {y} END)"
    )


def sql_x_lng(x: str) -> str:
    return f"(({x} - 0.5) * 360.0)"


def sql_y_lat(y: str) -> str:
    y2 = f"((180.0 - {y} * 360.0) * pi() / 180.0)"
    return f"(360.0 * atan(exp({y2})) / pi() - 90.0)"


def sql_fround(c: str) -> str:
    return f"CAST(CAST({c} AS REAL) AS DOUBLE)"
