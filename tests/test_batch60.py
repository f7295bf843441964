"""Batch-60 tests: c-TF-IDF per-source ranking shape, WoW growth math."""

from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_ctfidf_shape(spark, sf_dir):
    rows = REGISTRY["q_ctfidf"].spark(spark, sf_dir).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    n_src = spark.read.parquet(f"{sf_dir}/documents.parquet").select("source").distinct().count()
    assert len(by_src) == n_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 0 for s in scores)


def test_wow_growth_math(spark, sf_dir):
    rows = REGISTRY["q_wow_growth"].spark(spark, sf_dir).collect()
    weekly = defaultdict(dict)
    for r in rows:
        weekly[r.event_type][r.week] = r
    total = read_events(spark, sf_dir).count()
    assert sum(r.n for r in rows) == total
    for et, weeks in weekly.items():
        ordered = sorted(weeks)
        for prev_w, w in zip(ordered, ordered[1:]):
            r = weeks[w]
            if w - prev_w == 1:
                assert r.prev_n == weeks[prev_w].n
                expect = round((r.n - r.prev_n) / r.prev_n, 6)
                assert abs(r.wow_growth - expect) < 1e-9
        assert weeks[ordered[0]].prev_n is None
