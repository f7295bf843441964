"""Batch-73 tests: inter-arrival gap counts/ordering, early-value corr
bounds."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_interarrival_counts_and_order(spark, sf_dir):
    rows = {r.event_type: r for r in REGISTRY["q_interarrival"].spark(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's first contributes exactly one gap
    assert sum(r.n_gaps for r in rows.values()) == n_events - n_users
    for r in rows.values():
        assert 0 <= r.p50_min <= r.p90_min <= r.p99_min


def test_early_value_corr_bounds(spark, sf_dir):
    row = REGISTRY["q_early_value_corr"].spark(spark, sf_dir).collect()[0]
    assert row.n_users > 0
    assert -1.0 <= row.pearson <= 1.0
    assert 0.0 < row.mean_week1_share <= 1.0
    # week1 is a component of total -> correlation must be positive here
    assert row.pearson > 0
