"""Batch-28 tests: cluster hulls vs pure-Python per-cluster geometry,
nearest-event correctness vs brute force, confusion-matrix row sums."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dbscan import dbscan
from arrow_supercluster_spark.operators.hull import monotone_chain
from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.points import derived_points
from arrow_supercluster_spark.sources.tables import read_events


def test_cluster_hulls_match_python(spark, sf_dir):
    pts = derived_points(spark, sf_dir).filter(F.col("lng").isNotNull()).select(
        "id", "lng", "lat"
    )
    labels = {
        r.id: r.cluster
        for r in dbscan(pts, 2.0, 4).collect()
        if r.cluster >= 0
    }
    groups = defaultdict(list)
    for r in pts.collect():
        if r.id in labels:
            groups[labels[r.id]].append((r.lng, r.lat))
    expected = {}
    for cid, ps in groups.items():
        hull = monotone_chain(ps)
        area = perim = 0.0
        n = len(hull)
        if n >= 3:
            for i in range(n):
                x1, y1 = hull[i]
                x2, y2 = hull[(i + 1) % n]
                area += x1 * y2 - x2 * y1
                perim += ((x2 - x1) ** 2 + (y2 - y1) ** 2) ** 0.5
            area = abs(area) / 2.0
        elif n == 2:
            (x1, y1), (x2, y2) = hull
            perim = 2.0 * ((x2 - x1) ** 2 + (y2 - y1) ** 2) ** 0.5
        expected[cid] = (len(ps), n, round(area, 6), round(perim, 6))
    got = {
        r.cluster: (r.n_points, r.hull_size, r.area, r.perimeter)
        for r in REGISTRY["q_cluster_hulls"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    assert got


def test_nearest_event_vs_brute(spark, sf_dir):
    ev = read_events(spark, sf_dir).filter(
        F.col("event_type").isin("error", "click")
    ).select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")).collect()
    clicks = defaultdict(list)
    for r in ev:
        if r.event_type == "click":
            clicks[r.user_id].append(r.us)
    expected = {}
    for r in ev:
        if r.event_type != "error":
            continue
        cs = clicks.get(r.user_id)
        expected[r.event_id] = (
            min(abs(c - r.us) for c in cs) if cs else None
        )
    got = {
        r.event_id: r.gap_us
        for r in REGISTRY["q_nearest_event"].spark(spark, sf_dir).collect()
    }
    assert got == expected


def test_lang_confusion_shares(spark, sf_dir):
    rows = REGISTRY["q_lang_confusion"].spark(spark, sf_dir).collect()
    by_true = defaultdict(float)
    for r in rows:
        assert 0 < r.recall_share <= 1
        by_true[r.true_lang] += r.recall_share
    for lang, total in by_true.items():
        assert abs(total - 1.0) < 1e-4, (lang, total)
    # diagonal should dominate for at least some languages (the detector
    # is a stopword vote, not a coin flip)
    diag = [r for r in rows if r.true_lang == r.pred_lang]
    assert diag and max(r.recall_share for r in diag) > 0.5
