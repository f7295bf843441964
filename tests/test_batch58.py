"""Batch-58 tests: DBSCAN sweep monotonicity + consistency with the
labeled run, DAU/WAU math."""

from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_dbscan_sweep_monotone_and_consistent(spark, sf_dir):
    rows = sorted(REGISTRY["q_dbscan_sweep"].spark(spark, sf_dir).collect(), key=lambda r: r.eps)
    assert [r.eps for r in rows] == [1.0, 2.0, 3.0]
    total = rows[0].n_core + rows[0].n_border + rows[0].n_noise
    for r in rows:
        assert r.n_core + r.n_border + r.n_noise == total
    # noise shrinks, cores grow as eps loosens
    for a, b in zip(rows, rows[1:]):
        assert b.n_noise <= a.n_noise
        assert b.n_core >= a.n_core
    # eps=2 row must agree with the labeled q_dbscan run
    labeled = REGISTRY["q_dbscan"].spark(spark, sf_dir).collect()
    roles = defaultdict(int)
    for r in labeled:
        roles[r.role] += 1
    mid = rows[1]
    assert (mid.n_core, mid.n_border, mid.n_noise) == (
        roles["core"], roles["border"], roles["noise"]
    )


def test_dau_wau_math(spark, sf_dir):
    user_day = set()
    for r in read_events(spark, sf_dir).select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct().collect():
        user_day.add((r.user_id, r.d))
    days = sorted({d for _, d in user_day})
    got = {r.day_us: r for r in REGISTRY["q_dau_wau"].spark(spark, sf_dir).collect()}
    assert len(got) == len(days)
    import datetime

    for d in days:
        dau = sum(1 for u, dd in user_day if dd == d)
        wau = len({u for u, dd in user_day if d - datetime.timedelta(days=7) < dd <= d})
        key = int(d.timestamp() * 1_000_000)
        r = got[key]
        assert (r.dau, r.wau) == (dau, wau)
        assert 0 < r.stickiness <= 1.0
