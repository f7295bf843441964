"""Batch-59 tests: Markov step vs numpy matrix power, Pareto crossing."""

import numpy as np
from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_markov_matches_numpy(spark, sf_dir):
    ev = sorted(
        read_events(spark, sf_dir)
        .select("user_id", F.unix_micros("ts").alias("us"), "event_type", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    trans = defaultdict(lambda: defaultdict(int))
    prev = {}
    for r in ev:
        if r.user_id in prev:
            trans[prev[r.user_id]][r.event_type] += 1
        prev[r.user_id] = r.event_type
    states = sorted({r.event_type for r in ev})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for a, row in trans.items():
        tot = sum(row.values())
        for b, c in row.items():
            P[idx[a], idx[b]] = round(c / tot, 9)
    v = np.full(len(states), 1.0 / len(states))
    for _ in range(3):
        v = np.round(v @ P, 9)
    got = {r.event_type: r.weight for r in REGISTRY["q_markov_stationary"].spark(spark, sf_dir).collect()}
    for s in states:
        assert abs(got[s] - round(v[idx[s]], 6)) < 2e-6, (s, got[s], v[idx[s]])
    # long-run mix is a (sub-)distribution: terminal events leak mass
    assert 0.9 < sum(got.values()) <= 1.0 + 1e-6


def test_pareto_crossing(spark, sf_dir):
    row = REGISTRY["q_pareto_ratio"].spark(spark, sf_dir).collect()[0]
    spends = sorted(
        (
            round(v, 4)
            for v in (
                r.spend
                for r in read_events(spark, sf_dir)
                .filter(F.col("value").isNotNull())
                .groupBy("user_id")
                .agg(F.round(F.sum("value"), 4).alias("spend"))
                .collect()
            )
        ),
        reverse=True,
    )
    tot = sum(spends)
    cum, k = 0.0, 0
    for s in spends:
        cum += s
        k += 1
        if cum >= 0.8 * tot:
            break
    assert row.k_users == k
    assert row.n_users == len(spends)
    assert abs(row.user_fraction - round(k / len(spends), 6)) < 1e-9
    # synthetic spend is near-uniform, so the crossing sits near 0.8 —
    # only the bound is corpus-independent
    assert 0.0 < row.user_fraction <= 1.0
