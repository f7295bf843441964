"""Exact distributed convex hull — the canonical two-level reduction:
hull(P) = hull(hull(P₁) ∪ … ∪ hull(Pₖ)) for any partitioning, so each
partition computes its LOCAL hull (Andrew's monotone chain, public
algorithm) and only those vertices — O(h) per partition, typically tens
of rows against millions — leave the executors. The driver chains the
tiny union for the final answer. At 100 TB the reduction is one
mapInPandas pass; nothing else moves.

Determinism: duplicates collapse first; collinear points are dropped
(strict turns only); output is CCW starting at the lexicographically
smallest (lng, lat) vertex — identical under any partition count
(asserted in tests/test_batch26.py).
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def monotone_chain(pts: List[Tuple[float, float]]) -> List[Tuple[float, float]]:
    """Andrew's monotone chain; strict turns (collinear dropped); returns
    CCW vertices starting at the lexicographically smallest point."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts
    lower: list = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def convex_hull(pts: DataFrame, lng: str = "lng", lat: str = "lat") -> DataFrame:
    """(hull_pos, lng, lat): the convex hull of the point set, CCW from
    the lexicographic minimum. Exact for any partitioning."""
    spark = pts.sparkSession

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: list = []
        for pdf in batches:
            acc.extend(zip(pdf[lng].astype(float), pdf[lat].astype(float)))
        hull = monotone_chain(acc) if acc else []
        yield pd.DataFrame(
            {"lng": [p[0] for p in hull], "lat": [p[1] for p in hull]}
        )

    candidates = (
        pts.select(F.col(lng).cast("double").alias(lng), F.col(lat).cast("double").alias(lat))
        .filter(F.col(lng).isNotNull() & F.col(lat).isNotNull())
        .mapInPandas(local, schema="lng double, lat double")
        .collect()
    )
    final = monotone_chain([(r.lng, r.lat) for r in candidates])
    return spark.createDataFrame(
        [(i, p[0], p[1]) for i, p in enumerate(final)],
        "hull_pos int, lng double, lat double",
    )
