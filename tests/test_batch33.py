"""Batch-33 tests: HITS vs a Python replica with identical rounding,
Hill estimator math, seasonality conservation."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def _edges(spark, sf_dir):
    ev = read_events(spark, sf_dir).select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
    ).collect()
    by_key = defaultdict(set)
    for r in ev:
        by_key[(r.event_type, r.h)].add(r.user_id)
    es = set()
    for users in by_key.values():
        for u in users:
            for v in users:
                if u < v:
                    es.add((u, v))
    return es


def test_hits_matches_python_replica(spark, sf_dir):
    es = _edges(spark, sf_dir)
    nodes = sorted({u for u, _ in es} | {v for _, v in es})
    hub = {n: 1.0 for n in nodes}
    auth = {n: 1.0 for n in nodes}
    for _ in range(3):
        ra = {n: 0.0 for n in nodes}
        for u, v in es:
            ra[v] += hub[u]
        nrm = round(math.sqrt(sum(s * s for s in ra.values())), 9)
        auth = {n: (round(s / nrm, 9) if nrm > 0 else 0.0) for n, s in ra.items()}
        rh = {n: 0.0 for n in nodes}
        for u, v in es:
            rh[u] += auth[v]
        nrm = round(math.sqrt(sum(s * s for s in rh.values())), 9)
        hub = {n: (round(s / nrm, 9) if nrm > 0 else 0.0) for n, s in rh.items()}
    got = {r.node: (r.hub, r.authority) for r in REGISTRY["q_hits"].spark(spark, sf_dir).collect()}
    for n in nodes:
        gh, ga = got[n]
        assert abs(gh - round(hub[n], 6)) <= 2e-6, (n, gh, hub[n])
        assert abs(ga - round(auth[n], 6)) <= 2e-6
    # unit norms
    assert abs(sum(h * h for h, _ in got.values()) - 1.0) < 1e-3
    assert abs(sum(a * a for _, a in got.values()) - 1.0) < 1e-3


def test_hill_estimator_math(spark, sf_dir):
    vals = sorted(
        (
            r.value
            for r in read_events(spark, sf_dir)
            .filter(F.col("value").isNotNull() & (F.col("value") > 0))
            .collect()
        ),
        reverse=True,
    )
    k = 200
    xk = vals[k]
    mean_log = sum(math.log(v / xk) for v in vals[:k]) / k
    row = REGISTRY["q_hill_tail_index"].spark(spark, sf_dir).collect()[0]
    assert row.k == k
    assert abs(row.mean_log_excess - mean_log) < 1.01e-6
    assert abs(row.alpha - 1.0 / mean_log) < 1.01e-4
    assert row.alpha > 0


def test_seasonality_conservation(spark, sf_dir):
    rows = REGISTRY["q_seasonality"].spark(spark, sf_dir).collect()
    total = read_events(spark, sf_dir).count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hod <= 23
        assert r.load_ratio > 0
    mean_ratio = sum(r.load_ratio for r in rows) / len(rows)
    assert abs(mean_ratio - 1.0) < 1e-3
