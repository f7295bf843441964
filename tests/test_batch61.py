"""Batch-61 tests: seasonal index mean-one property, co-occurrence lift
math, ANOVA vs scipy-free reference."""

from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_seasonal_index_properties(spark, sf_dir):
    rows = REGISTRY["q_seasonal_index"].spark(spark, sf_dir).collect()
    total = read_events(spark, sf_dir).count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert r.seasonal_index > 0
        assert abs(r.deseasonalized - round(r.n / r.seasonal_index, 6)) < 1e-9
    # deseasonalized variance should not exceed the raw variance much
    raw = np.array([r.n for r in rows], dtype=float)
    des = np.array([r.deseasonalized for r in rows])
    assert des.std() <= raw.std() * 1.25


def test_session_cooccurrence_lift(spark, sf_dir):
    rows = REGISTRY["q_session_cooccurrence"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.t1 < r.t2
        assert 0 < r.support <= 1
        assert r.lift > 0
    # brute-force recomputation of one pair's support/lift
    ev = sorted(
        read_events(spark, sf_dir)
        .select("user_id", F.unix_micros("ts").alias("us"), "event_type", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    baskets = []
    prev_user, prev_us = None, None
    for r in ev:
        if r.user_id != prev_user or r.us - prev_us > 30 * 60 * 1000000:
            baskets.append(set())
        baskets[-1].add(r.event_type)
        prev_user, prev_us = r.user_id, r.us
    n = len(baskets)
    r0 = rows[0]
    c12 = sum(1 for b in baskets if r0.t1 in b and r0.t2 in b)
    c1 = sum(1 for b in baskets if r0.t1 in b)
    c2 = sum(1 for b in baskets if r0.t2 in b)
    assert r0.c12 == c12
    assert abs(r0.support - round(c12 / n, 6)) < 1e-9
    assert abs(r0.lift - (c12 / n) / ((c1 / n) * (c2 / n))) < 1.01e-5


def test_anova_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    groups = defaultdict(list)
    for r in docs:
        groups[r.lang].append(float(r.n_chars))
    all_vals = [v for g in groups.values() for v in g]
    grand = sum(all_vals) / len(all_vals)
    k, nt = len(groups), len(all_vals)
    ssb = sum(len(g) * (np.mean(g) - grand) ** 2 for g in groups.values())
    ssw = sum(((np.array(g) - np.mean(g)) ** 2).sum() for g in groups.values())
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    row = REGISTRY["q_anova_f"].spark(spark, sf_dir).collect()[0]
    assert (row.n_groups, row.n_total) == (k, nt)
    assert abs(row.f_stat - f) < 1.01e-4
    assert row.f_stat >= 0
