"""Batch-163 tests: Wilcoxon signed-rank vs scipy, sign test binomial
oracle, Mood's median test vs scipy.median_test."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import numpy as np


def _pairs(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    rows = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "click", 1).otherwise(0)
                )
                - F.sum(
                    F.when(F.col("event_type") == "view", 1).otherwise(0)
                )
            ).alias("diff")
        )
        .collect()
    )
    return np.array([r.diff for r in rows], float)


def test_wilcoxon_signed_rank_matches_scipy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext168 import (
        q_wilcoxon_signed_rank,
    )

    r = q_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    d = _pairs(spark, sf_dir)
    nz = d[d != 0]
    n = len(nz)
    assert r.n_nonzero_pairs == n
    # python midrank replay
    ad = np.abs(nz)
    mid = np.array(
        [(ad < a).sum() + (1 + (ad == a).sum()) / 2 for a in ad]
    )
    w_plus = mid[nz > 0].sum()
    assert abs(r.w_plus - w_plus) < 1e-6
    # tie-corrected variance
    _, counts = np.unique(ad, return_counts=True)
    tie = ((counts**3 - counts)[counts > 1]).sum()
    var = n * (n + 1) * (2 * n + 1) / 24 - tie / 48
    z = (w_plus - n * (n + 1) / 4) / np.sqrt(var)
    assert abs(r.z - z) < 1e-3
    assert r.reject_5pct == (abs(z) > 1.96)
    try:
        from scipy import stats
    except ImportError:
        return
    sp = stats.wilcoxon(
        nz, correction=False, mode="approx", alternative="two-sided"
    )
    # scipy reports W = min(W+, W-); our z matches |z| from its p-value
    z_sp = stats.norm.isf(sp.pvalue / 2)
    assert abs(abs(z) - z_sp) < 1e-3


def test_sign_test_binomial_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext168 import q_sign_test

    r = q_sign_test(spark, sf_dir).collect()[0]
    d = _pairs(spark, sf_dir)
    nz = d[d != 0]
    n, k = len(nz), int((nz > 0).sum())
    assert (r.n_nonzero_pairs, r.n_pos) == (n, k)
    z = (abs(k - n / 2) - 0.5) / np.sqrt(n / 4)
    assert abs(r.z - z) < 1e-4
    assert r.reject_5pct == (z > 1.96)
    try:
        from scipy import stats
    except ImportError:
        return
    # the continuity-corrected normal z should land near the exact
    # binomial two-sided p at this n
    p_exact = stats.binomtest(k, n, 0.5).pvalue
    p_norm = 2 * stats.norm.sf(z)
    assert abs(p_exact - p_norm) < 0.08


def test_moods_median_matches_scipy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext168 import (
        _MM_CRIT,
        q_moods_median,
    )

    r = q_moods_median(spark, sf_dir).collect()[0]
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type AS g", "CAST(round(value*100) AS LONG) c")
        .collect()
    )
    by = {}
    for x in rows:
        by.setdefault(x.g, []).append(x.c)
    samples = [np.array(v, float) for g, v in sorted(by.items())]
    assert r.n == sum(len(s) for s in samples)
    assert r.k == len(samples)
    # python replay with the query's convention (<= grand median = below)
    allv = np.concatenate(samples)
    med = np.percentile(allv, 50)
    assert abs(r.grand_median - med / 100) < 1e-6
    ta = sum(int((s > med).sum()) for s in samples)
    tb = sum(int((s <= med).sum()) for s in samples)
    n = ta + tb
    chi = 0.0
    for s in samples:
        a, b = int((s > med).sum()), int((s <= med).sum())
        ea, eb = len(s) * ta / n, len(s) * tb / n
        chi += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    assert abs(r.moods_chi2 - chi) < 1e-3
    assert r.medians_differ == (chi > _MM_CRIT)
    try:
        from scipy import stats
    except ImportError:
        return
    sp = stats.median_test(*samples, ties="below", correction=False)
    assert abs(r.moods_chi2 - sp.statistic) < 1e-3
