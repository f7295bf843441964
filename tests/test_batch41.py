"""Batch-41 tests: zlib parity, entropy math, Clark-Evans reference."""

import math
import zlib
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.points import derived_points
from arrow_supercluster_spark.sources.tables import read_events


def test_compression_matches_zlib(spark, sf_dir):
    docs = {r.doc_id: r.text for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    rows = REGISTRY["q_compression_quality"].spark(spark, sf_dir).collect()
    assert len(rows) == len(docs)
    for r in rows[:200]:
        raw = docs[r.doc_id].encode("utf-8")
        assert r.raw_bytes == len(raw)
        assert r.zlib_bytes == len(zlib.compress(raw, 6))
        if raw:
            assert abs(r.ratio - round(r.zlib_bytes / len(raw), 6)) < 1e-12
            assert 0 < r.ratio < 2


def test_user_entropy_math(spark, sf_dir):
    ev = read_events(spark, sf_dir).select("user_id", "event_type").collect()
    mix = defaultdict(lambda: defaultdict(int))
    for r in ev:
        mix[r.user_id][r.event_type] += 1
    got = {r.user_id: r for r in REGISTRY["q_user_entropy"].spark(spark, sf_dir).collect()}
    for u, types in mix.items():
        n = sum(types.values())
        h = -sum((c / n) * math.log(c / n) for c in types.values())
        assert got[u].n_events == n and got[u].n_types == len(types)
        assert abs(got[u].entropy - h) < 1.01e-6
        assert 0.0 <= got[u].entropy <= math.log(5) + 1e-9


def test_clark_evans_reference(spark, sf_dir):
    pts = [
        (r.id, r.lng, r.lat)
        for r in derived_points(spark, sf_dir)
        .filter(F.col("lng").isNotNull())
        .collect()
    ]
    cells = defaultdict(list)
    for i, x, y in pts:
        cells[(math.floor(x), math.floor(y))].append((i, x, y))
    dists = {}
    for (cx, cy), members in cells.items():
        cand = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                cand.extend(cells.get((cx + dx, cy + dy), []))
        for i, x, y in members:
            best = min(
                (math.hypot(x - bx, y - by) for j, bx, by in cand if j != i),
                default=None,
            )
            if best is not None:
                dists[i] = best
    xs = [x for _, x, _ in pts]
    ys = [y for _, _, y in pts]
    area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    lam = len(pts) / area
    expected = 0.5 / math.sqrt(lam)
    row = REGISTRY["q_clark_evans"].spark(spark, sf_dir).collect()[0]
    assert row.n_points == len(pts)
    assert row.n_with_nn == len(dists)
    assert abs(row.mean_nn - np.mean(list(dists.values()))) < 1.01e-5
    assert abs(row.expected_nn - expected) < 1.01e-6
    assert row.ce_index > 0
