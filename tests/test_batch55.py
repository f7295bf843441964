"""Batch-55 tests: threshold-sweep monotonicity, bounce-rate math."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_threshold_sweep_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_dedup_threshold_sweep"].spark(spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.3, 0.5, 0.7]
    # tightening the threshold can only remove edges/nodes
    for a, b in zip(rows, rows[1:]):
        assert b.n_edges <= a.n_edges
        assert b.n_nodes <= a.n_nodes
    for r in rows:
        assert r.n_nodes <= 2 * r.n_edges


def test_bounce_rate_math(spark, sf_dir):
    ev = sorted(
        read_events(spark, sf_dir)
        .select("user_id", F.unix_micros("ts").alias("us"), "event_type", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    sessions = []
    prev_user, prev_us = None, None
    for r in ev:
        if r.user_id != prev_user or r.us - prev_us > 30 * 60 * 1000000:
            sessions.append([r.event_type, 0])
        sessions[-1][1] += 1
        prev_user, prev_us = r.user_id, r.us
    agg = defaultdict(lambda: [0, 0])
    for entry, n in sessions:
        agg[entry][0] += 1
        if n == 1:
            agg[entry][1] += 1
    got = {r.entry_type: r for r in REGISTRY["q_bounce_rate"].spark(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for et, (ns, nb) in agg.items():
        assert (got[et].n_sessions, got[et].n_bounces) == (ns, nb)
        assert abs(got[et].bounce_rate - round(nb / ns, 6)) < 1e-9
