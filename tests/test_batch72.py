"""Batch-72 tests: session-depth ↔ bounce-rate consistency, priority
shares sum to one."""

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_session_depth_consistent_with_bounce(spark, sf_dir):
    depth = {r.depth: r.n_sessions for r in REGISTRY["q_session_depth"].spark(spark, sf_dir).collect()}
    bounce = REGISTRY["q_bounce_rate"].spark(spark, sf_dir).collect()
    assert depth
    # total sessions and total bounces must match the bounce-rate rollup
    assert sum(depth.values()) == sum(r.n_sessions for r in bounce)
    assert depth.get(1, 0) == sum(r.n_bounces for r in bounce)
    assert all(d >= 1 for d in depth)


def test_priority_shares_sum_to_one(spark, sf_dir):
    rows = REGISTRY["q_priority_mix_by_year"].spark(spark, sf_dir).collect()
    from collections import defaultdict

    by_year = defaultdict(float)
    for r in rows:
        assert 0.0 < r.share <= 1.0
        by_year[r.yr] += r.share
    for yr, tot in by_year.items():
        assert abs(tot - 1.0) < 1e-4, (yr, tot)
