"""Filter operators F1-F4 (SURVEY.md §2a).

All are plain Catalyst predicates → pushed down to the parquet scan
(`PushedFilters` in .explain), which is the scale story: at 100 TB the
mask/null/bbox filters prune row groups before any clustering work, the
exact analog of the reference running its mask before indexing
(arrow-cluster-engine.ts:79-91; bench note "fewer points = faster load",
benchmarks/run.ts:491-538).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def drop_null_geometry(df: DataFrame, lng: str = "lng", lat: str = "lat") -> DataFrame:
    """F2 — null/NaN coordinates never enter the index
    (arrow-cluster-engine.ts:84-91)."""
    return df.filter(
        F.col(lng).isNotNull()
        & F.col(lat).isNotNull()
        & ~F.isnan(F.col(lng))
        & ~F.isnan(F.col(lat))
    )


def apply_mask(df: DataFrame, mask: Column) -> DataFrame:
    """F1 — filter-mask semantics: mask==0 rows are excluded entirely from
    clustering (arrow-cluster-engine.ts:62,79). Masked-load ≡ pre-filtered
    load is the reference's own equivalence test (filter-mask.test.ts:86-108)
    and holds trivially here because the mask IS a pre-filter."""
    return df.filter(mask)


def city_mask(df: DataFrame, cities: list[str], city_col: str = "city") -> DataFrame:
    """F3 — predicate→mask build (examples/basic/src/main.ts:56-63) exposed
    as a mask column; kept as a column (not a filter) to mirror the
    reference's mask-array contract."""
    return df.withColumn("mask", F.col(city_col).isin(cities).cast("int"))


def normalize_bbox(min_lng: float, min_lat: float, max_lng: float, max_lat: float):
    """F4 bbox normalization (arrow-cluster-engine.ts:130-143): wrap lng
    into [-180,180], clamp lat to ±90; ≥360° span → whole world; returns a
    list of 1 or 2 (min_lng, min_lat, max_lng, max_lat) boxes — two when
    the box crosses the antimeridian (reference recurses into two queries
    merged by _mergeOutputs, :139-143/Q6)."""
    min_lat = max(-90.0, min(90.0, min_lat))
    max_lat = max(-90.0, min(90.0, max_lat))
    if max_lng - min_lng >= 360.0:
        min_lng, max_lng = -180.0, 180.0
    else:
        min_lng = ((min_lng + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
        # Reference special case (arrow-cluster-engine.ts:133): an input max
        # lng of exactly 180 stays 180 — wrapping it to -180 would trigger a
        # spurious antimeridian split whose (-180..-180) half over-includes
        # points at lng=-180 relative to the reference's single query.
        if max_lng != 180.0:
            max_lng = ((max_lng + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    if min_lng > max_lng:  # antimeridian crossing → split
        return [
            (min_lng, min_lat, 180.0, max_lat),
            (-180.0, min_lat, max_lng, max_lat),
        ]
    return [(min_lng, min_lat, max_lng, max_lat)]


def bbox_predicate(
    min_lng: float,
    min_lat: float,
    max_lng: float,
    max_lat: float,
    lng: str = "lng",
    lat: str = "lat",
) -> Column:
    """F4 — bbox filter as a single predicate; the antimeridian split
    becomes an OR of ranges (no union needed relationally — SURVEY §2a F4).
    Catalyst pushes each range down to the scan."""
    boxes = normalize_bbox(min_lng, min_lat, max_lng, max_lat)
    pred = None
    for lo_lng, lo_lat, hi_lng, hi_lat in boxes:
        p = (
            F.col(lng).between(lo_lng, hi_lng)
            & F.col(lat).between(lo_lat, hi_lat)
        )
        pred = p if pred is None else (pred | p)
    return pred


def sql_bbox_predicate(
    min_lng: float, min_lat: float, max_lng: float, max_lat: float,
    lng: str = "lng", lat: str = "lat",
) -> str:
    """SQL twin of bbox_predicate for the DuckDB oracle."""
    boxes = normalize_bbox(min_lng, min_lat, max_lng, max_lat)
    parts = [
        f"({lng} BETWEEN {a!r} AND {c!r} AND {lat} BETWEEN {b!r} AND {d!r})"
        for a, b, c, d in boxes
    ]
    return "(" + " OR ".join(parts) + ")"
