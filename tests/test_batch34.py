"""Batch-34 tests: CUSUM vs Python scan, Mann-Whitney vs scipy-free
reference math, Lorenz curve monotonicity/convexity."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_cusum_matches_python(spark, sf_dir):
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("d")
        .collect()
    )
    mu = sum(r.n for r in daily) / len(daily)
    acc, series = 0.0, []
    for r in daily:
        acc += r.n - mu
        series.append(round(acc, 6) + 0.0)
    mx = max(abs(c) for c in series)
    got = sorted(
        REGISTRY["q_cusum_changepoint"].spark(spark, sf_dir).collect(),
        key=lambda r: r.day_us,
    )
    assert len(got) == len(series)
    n_cp = 0
    for r, c in zip(got, series):
        assert abs(r.cusum - c) < 2e-6
        n_cp += r.is_changepoint
    assert n_cp >= 1
    flagged = [r for r in got if r.is_changepoint]
    for r in flagged:
        assert abs(abs(r.cusum) - mx) < 2e-6


def test_mann_whitney_reference_math(spark, sf_dir):
    per_user = defaultdict(float)
    for r in read_events(spark, sf_dir).filter(F.col("value").isNotNull()).collect():
        per_user[r.user_id] += r.value
    spends = sorted(
        (round(v, 4), u % 2) for u, v in per_user.items()
    )
    # midranks with ties
    vals = [s for s, _ in spends]
    r1 = n1 = n0 = 0
    for i, (s, arm) in enumerate(spends):
        lo = vals.index(s)
        hi = len(vals) - 1 - vals[::-1].index(s)
        midrank = (lo + 1 + hi + 1) / 2.0
        if arm == 1:
            r1 += midrank
            n1 += 1
        else:
            n0 += 1
    u1 = r1 - n1 * (n1 + 1) / 2.0
    z = (u1 - n0 * n1 / 2.0) / math.sqrt(n0 * n1 * (n0 + n1 + 1) / 12.0)
    row = REGISTRY["q_mann_whitney"].spark(spark, sf_dir).collect()[0]
    assert (row.n0, row.n1) == (n0, n1)
    assert abs(row.u1 - u1) < 1e-6
    assert abs(row.z - z) < 1e-5


def test_lorenz_monotone_convex(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_lorenz"].spark(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert rows[-1].decile == 10
    assert abs(rows[-1].pop_share - 1.0) < 1e-9
    assert abs(rows[-1].spend_share - 1.0) < 1e-6
    prev_pop = prev_spend = 0.0
    for r in rows:
        assert r.pop_share > prev_pop and r.spend_share >= prev_spend
        # Lorenz curve lies under the diagonal
        assert r.spend_share <= r.pop_share + 1e-9
        prev_pop, prev_spend = r.pop_share, r.spend_share
