"""Batch-42 tests: windowed funnel vs brute force, elasticity formula,
Kaplan-Meier properties."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_funnel_within_vs_brute(spark, sf_dir):
    ev = read_events(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    views = {}
    purchases = defaultdict(list)
    for r in ev:
        if r.event_type == "view":
            views[r.user_id] = min(views.get(r.user_id, r.us), r.us)
        elif r.event_type == "purchase":
            purchases[r.user_id].append(r.us)
    win = 7 * 86400000000
    n_conv, hours = 0, []
    for u, v in views.items():
        cand = [p for p in purchases.get(u, []) if v <= p < v + win]
        if cand:
            n_conv += 1
            hours.append((min(cand) - v) / 3600000000.0)
    row = REGISTRY["q_funnel_within"].spark(spark, sf_dir).collect()[0]
    assert row.n_viewers == len(views)
    assert row.n_converted == n_conv
    assert abs(row.conversion - n_conv / len(views)) < 1.01e-6
    if hours:
        assert abs(row.avg_hours - sum(hours) / len(hours)) < 1.01e-5


def test_elasticity_outputs(spark, sf_dir):
    rows = REGISTRY["q_elasticity"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n > 1
        assert -1.0 <= r.r <= 1.0
        # extendedprice = qty * unit price in TPC-H-ish data makes lq and
        # lp nearly independent -> no sign assertion, just finiteness
        assert r.elasticity is not None and not math.isnan(r.elasticity)


def test_kaplan_meier_properties(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_kaplan_meier"].spark(spark, sf_dir).collect(),
        key=lambda r: r.t_days,
    )
    assert rows
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev + 1e-9  # non-increasing
        prev = r.survival
        assert 0 <= r.d <= r.at_risk
    # at_risk decreases with t (reverse cumulative)
    ar = [r.at_risk for r in rows]
    assert all(a >= b for a, b in zip(ar, ar[1:]))
