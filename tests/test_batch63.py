"""Batch-63 tests: LTV triangle invariants, Cohen's d reference."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_ltv_triangle_invariants(spark, sf_dir):
    rows = REGISTRY["q_ltv_triangle"].spark(spark, sf_dir).collect()
    assert rows
    total_rev = sum(r.revenue for r in rows)
    ev_rev = (
        read_events(spark, sf_dir)
        .filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .agg(F.round(F.sum("value"), 2))
        .collect()[0][0]
    )
    assert abs(total_rev - ev_rev) < 1.0  # per-cell rounding drift only
    by_cohort = defaultdict(list)
    for r in rows:
        assert r.age_week >= 0
        by_cohort[r.cohort_week].append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_week)
        ltv = [r.cum_ltv_per_user for r in rs]
        assert all(b >= a - 1e-6 for a, b in zip(ltv, ltv[1:]))  # cumulative


def test_cohens_d_reference(spark, sf_dir):
    per_user = defaultdict(float)
    for r in read_events(spark, sf_dir).filter(F.col("value").isNotNull()).collect():
        per_user[r.user_id] += r.value
    arms = {0: [], 1: []}
    for u, v in per_user.items():
        arms[u % 2].append(round(v, 4))
    def stats(xs):
        n = len(xs)
        mu = sum(xs) / n
        v = sum((x - mu) ** 2 for x in xs) / (n - 1)
        return n, mu, v
    n0, mu0, v0 = stats(arms[0])
    n1, mu1, v1 = stats(arms[1])
    pooled = math.sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2))
    row = REGISTRY["q_cohens_d"].spark(spark, sf_dir).collect()[0]
    assert (row.n0, row.n1) == (n0, n1)
    assert abs(row.pooled_sd - pooled) < 1.01e-4
    assert abs(row.cohens_d - (mu1 - mu0) / pooled) < 1.01e-5
