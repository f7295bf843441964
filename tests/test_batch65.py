"""Batch-65 tests: vocab-overlap bounds/pair count, temporal cosine
bounds + self-similarity logic."""

from collections import defaultdict

import math
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_vocab_overlap_bounds(spark, sf_dir):
    rows = REGISTRY["q_vocab_overlap"].spark(spark, sf_dir).collect()
    n_src = spark.read.parquet(f"{sf_dir}/documents.parquet").select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert 0.0 < r.jaccard <= 1.0  # shared template vocab guarantees > 0
        assert r.n_common >= 1


def test_temporal_profile_cosine(spark, sf_dir):
    rows = REGISTRY["q_temporal_profile_sim"].spark(spark, sf_dir).collect()
    types = {r.event_type for r in read_events(spark, sf_dir).select("event_type").distinct().collect()}
    assert len(rows) == len(types) * (len(types) - 1) // 2
    # brute-force one pair
    prof = defaultdict(lambda: [0.0] * 24)
    for r in read_events(spark, sf_dir).select("event_type", F.hour("ts").alias("h")).collect():
        prof[r.event_type][r.h] += 1
    r0 = rows[0]
    a, b = prof[r0.t1], prof[r0.t2]
    dot = sum(x * y for x, y in zip(a, b))
    cos = dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
    assert abs(r0.cosine - cos) < 1.01e-5
    for r in rows:
        assert 0.0 <= r.cosine <= 1.0  # counts are non-negative
