"""Batch-35 tests: KS statistic vs Python ECDFs, ACF vs numpy, Spearman
vs rank math."""

import math
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def _spends(spark, sf_dir):
    per_user = defaultdict(float)
    for r in read_events(spark, sf_dir).filter(F.col("value").isNotNull()).collect():
        per_user[r.user_id] += r.value
    return {u: round(v, 4) for u, v in per_user.items()}


def test_ks_matches_python(spark, sf_dir):
    spends = _spends(spark, sf_dir)
    s0 = sorted(v for u, v in spends.items() if u % 2 == 0)
    s1 = sorted(v for u, v in spends.items() if u % 2 == 1)
    xs = sorted(set(s0) | set(s1))
    import bisect

    d = max(
        abs(bisect.bisect_right(s0, x) / len(s0) - bisect.bisect_right(s1, x) / len(s1))
        for x in xs
    )
    row = REGISTRY["q_ks_test"].spark(spark, sf_dir).collect()[0]
    assert (row.n0, row.n1) == (len(s0), len(s1))
    assert abs(row.d - d) < 1.01e-6
    assert abs(row.ks_stat - d * math.sqrt(len(s0) * len(s1) / (len(s0) + len(s1)))) < 1e-4
    assert 0.0 <= row.d <= 1.0


def test_acf_matches_numpy(spark, sf_dir):
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("d")
        .collect()
    )
    series = np.array([r.n for r in daily], dtype=float)
    got = {r.lag: r for r in REGISTRY["q_autocorrelation"].spark(spark, sf_dir).collect()}
    for lag in range(1, 8):
        a, b = series[:-lag], series[lag:]
        r = got[lag]
        assert r.n_pairs == len(a)
        expect = float(np.corrcoef(a, b)[0, 1])
        assert abs(r.acf - expect) < 1.01e-5, (lag, r.acf, expect)
        assert -1.0 <= r.acf <= 1.0


def test_spearman_matches_rank_math(spark, sf_dir):
    per_user = defaultdict(lambda: [0, 0.0])
    for r in read_events(spark, sf_dir).filter(F.col("value").isNotNull()).collect():
        per_user[r.user_id][0] += 1
        per_user[r.user_id][1] += r.value
    freqs = [v[0] for v in per_user.values()]
    spends = [round(v[1], 4) for v in per_user.values()]

    def midranks(xs):
        order = sorted(xs)
        return [
            (order.index(x) + 1 + len(order) - 1 - order[::-1].index(x) + 1) / 2.0
            for x in xs
        ]

    rf, rs = midranks(freqs), midranks(spends)
    expect = float(np.corrcoef(rf, rs)[0, 1])
    row = REGISTRY["q_spearman"].spark(spark, sf_dir).collect()[0]
    assert row.n_users == len(per_user)
    assert abs(row.spearman - expect) < 1.01e-5
