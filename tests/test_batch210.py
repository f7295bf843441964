"""Batch-210 tests: python replays of the classical-test completions —
Fisher exact (hypergeometric via math.lgamma), the G-test grid, and the
negative-binomial moment fit."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import Counter

from pyspark.sql import functions as F


def test_fisher_exact_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.sources.tables import read_events

    row = REGISTRY["q_fisher_exact"].spark(spark, sf_dir).collect()[0]
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"), (F.dayofweek("ts") - 1).alias("dow"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("p")
        )
        .collect()
    )
    mu = sum(r.p for r in daily) / len(daily)
    a = sum(1 for r in daily if r.dow in (0, 6) and r.p >= mu)
    b = sum(1 for r in daily if r.dow in (0, 6) and r.p < mu)
    c = sum(1 for r in daily if r.dow not in (0, 6) and r.p >= mu)
    d = sum(1 for r in daily if r.dow not in (0, 6) and r.p < mu)
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
    r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d

    def pmf(k):
        return math.exp(
            math.lgamma(r1 + 1) - math.lgamma(k + 1) - math.lgamma(r1 - k + 1)
            + math.lgamma(r2 + 1) - math.lgamma(c1 - k + 1)
            - math.lgamma(r2 - c1 + k + 1)
            - (math.lgamma(n + 1) - math.lgamma(c1 + 1)
               - math.lgamma(n - c1 + 1))
        )

    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    p_obs = pmf(a)
    p_two = sum(
        pmf(k) for k in range(lo, hi + 1) if pmf(k) <= p_obs * (1 + 1e-7)
    )
    assert abs(row.pmf_observed - p_obs) < 1e-6
    assert abs(row.p_two_sided - p_two) < 1e-5
    assert 0.0 <= row.p_two_sided <= 1.0 + 1e-9


def test_g_test_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    row = REGISTRY["q_g_test"].spark(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "lang"
    ).collect()
    grid = Counter((r.source, r.lang) for r in docs)
    rm = Counter(r.source for r in docs)
    cm = Counter(r.lang for r in docs)
    n = len(docs)
    g = sum(
        2.0 * o * math.log(o * n / (rm[s] * cm[lg]))
        for (s, lg), o in grid.items()
    )
    assert abs(row.g_stat - g) < 1e-4
    assert row.df == (len(rm) - 1) * (len(cm) - 1)


def test_negative_binomial_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    row = REGISTRY["q_negative_binomial"].spark(spark, sf_dir).collect()[0]
    counts = [
        r.k
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    ]
    n = len(counts)
    m = sum(counts) / n
    v = (sum(k * k for k in counts) - sum(counts) ** 2 / n) / (n - 1)
    assert row.n_users == n
    assert abs(row.mean_events - m) < 1e-5
    assert abs(row.var_events - v) < 1e-4
    assert abs(row.dispersion_index - v / m) < 1e-5
    if v > m:
        assert row.overdispersed
        assert abs(row.nb_size_r - m * m / (v - m)) < 1e-4
        assert abs(row.nb_p - m / v) < 1e-6
