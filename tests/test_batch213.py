"""Batch-213 tests: python replays of the time-series complexity
diagnostics on the daily count series."""

import math

from pyspark.sql import functions as F


def _series(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("day")
        .collect()
    )
    return [r.c for r in rows]


def test_permutation_entropy_replay(spark, sf_dir):
    from collections import Counter

    from arrow_supercluster_spark.plans.registry import REGISTRY

    c = _series(spark, sf_dir)
    pats = Counter()
    for v1, v2, v3 in zip(c, c[1:], c[2:]):
        code = (v2 < v1) + (v3 < v1) * 2 + (v3 < v2) * 4
        pats[code] += 1
    t = sum(pats.values())
    h = sum(-(n / t) * math.log(n / t) for n in pats.values())
    row = REGISTRY["q_permutation_entropy"].spark(spark, sf_dir).collect()[0]
    assert row.n_windows == t
    assert row.n_patterns == len(pats)
    assert abs(row.perm_entropy_nats - h) < 1e-5
    assert abs(row.perm_entropy_norm - h / math.log(6)) < 1e-5
    assert 0 <= row.perm_entropy_norm <= 1 + 1e-9


def test_sample_entropy_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    c = _series(spark, sf_dir)
    n = len(c)
    mu = sum(c) / n
    sd = math.sqrt((sum(x * x for x in c) - sum(c) ** 2 / n) / (n - 1))
    r = 0.2 * sd
    bb = aa = 0
    for i in range(n - 1):
        for j in range(i + 1, n - 1):
            d2 = max(abs(c[i] - c[j]), abs(c[i + 1] - c[j + 1]))
            if d2 <= r:
                bb += 1
            if i + 2 < n and j + 2 < n:
                d3 = max(d2, abs(c[i + 2] - c[j + 2]))
                if d3 <= r:
                    aa += 1
    row = REGISTRY["q_sample_entropy"].spark(spark, sf_dir).collect()[0]
    assert row.m_matches == bb
    assert row.m1_matches == aa
    if aa > 0 and bb > 0:
        assert abs(row.sampen - (-math.log(aa / bb))) < 1e-5
        assert row.sampen >= -1e-9  # A ⊆ B window pairs ⇒ A ≤ B


def test_kpss_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext218 import (
        _KPSS_CRIT_5,
        _KPSS_L,
    )

    c = _series(spark, sf_dir)
    n = len(c)
    mu = sum(c) / n
    e = [x - mu for x in c]
    s_t, acc = [], 0.0
    for x in e:
        acc += x
        s_t.append(acc)
    gam = [
        sum(e[t] * e[t + j] for t in range(n - j)) / n
        for j in range(_KPSS_L + 1)
    ]
    lrv = gam[0] + 2 * sum(
        (1 - j / (_KPSS_L + 1)) * gam[j] for j in range(1, _KPSS_L + 1)
    )
    stat = sum(x * x for x in s_t) / (n * n * lrv)
    row = REGISTRY["q_kpss_level"].spark(spark, sf_dir).collect()[0]
    assert row.n_days == n
    assert abs(row.longrun_var - lrv) < max(1e-4, abs(lrv) * 1e-6)
    assert abs(row.kpss_stat - stat) < 1e-5
    assert row.reject_level_stationarity_5pct == (stat > _KPSS_CRIT_5)
