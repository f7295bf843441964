"""Batch-188 tests: exact-Φ (math.erf) replays of AD / Lilliefors /
Shapiro-Francia, with scipy cross-checks when available."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math

import numpy as np
from pyspark.sql import functions as F


def _phi(z):
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def _probit(p):
    """Φ⁻¹ by bisection on the erf-exact Φ (|err| < 1e-12)."""
    lo, hi = -10.0, 10.0
    for _ in range(80):
        mid = (lo + hi) / 2.0
        if _phi(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def _purchase_cents(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.round(F.col("value") * 100).cast("long").alias("c"))
        .collect()
    )
    return np.array(sorted(r.c for r in rows), dtype=float)


def test_anderson_darling_matches_exact_phi_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext193 import (
        _AD_CRIT_5,
        q_anderson_darling,
    )

    x = _purchase_cents(spark, sf_dir)
    n = len(x)
    mu, sd = x.mean(), x.std(ddof=1)
    a2 = -n
    acc = 0.0
    for i, v in enumerate(x, start=1):
        p = _phi((v - mu) / sd)
        acc += (2 * i - 1) * math.log(p) + (2 * n + 1 - 2 * i) * math.log(
            1.0 - p
        )
    a2 -= acc / n
    [r] = q_anderson_darling(spark, sf_dir).collect()
    assert r.n == n
    # ZS-Phi vs exact Phi: log-terms each off by ~1e-7 relative
    assert abs(r.a2 - a2) < 5e-4
    assert abs(r.a2_adj - a2 * (1 + 0.75 / n + 2.25 / n**2)) < 5e-4
    assert r.reject_5pct == (a2 > _AD_CRIT_5 / (1 + 4.0 / n - 25.0 / n**2))
    try:
        from scipy import stats
    except ImportError:
        return
    res = stats.anderson(x, "norm")
    assert abs(r.a2 - res.statistic) < 5e-4


def test_lilliefors_matches_exact_phi_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext193 import (
        _LF_CRIT_NUM,
        q_lilliefors,
    )

    x = _purchase_cents(spark, sf_dir)
    n = len(x)
    mu, sd = x.mean(), x.std(ddof=1)
    vals, counts = np.unique(x, return_counts=True)
    cb = np.cumsum(counts)
    d = 0.0
    for v, c, b in zip(vals, counts, cb):
        p = _phi((v - mu) / sd)
        d = max(d, b / n - p, p - (b - c) / n)
    [r] = q_lilliefors(spark, sf_dir).collect()
    assert r.n == n
    assert abs(r.d_stat - d) < 1e-6
    assert abs(r.crit_5pct - round(_LF_CRIT_NUM / math.sqrt(n), 6)) < 1e-9
    assert r.reject_5pct == (d > _LF_CRIT_NUM / math.sqrt(n))


def test_shapiro_francia_matches_exact_probit_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext193 import (
        q_shapiro_francia,
    )

    x = _purchase_cents(spark, sf_dir)
    n = len(x)
    m = np.array(
        [_probit((i - 0.375) / (n + 0.25)) for i in range(1, n + 1)]
    )
    w_prime = (m @ x) ** 2 / ((m @ m) * ((x - x.mean()) ** 2).sum())
    [r] = q_shapiro_francia(spark, sf_dir).collect()
    assert r.n == n
    # BSM probit |err| < 3e-9 per score
    assert abs(r.w_prime - w_prime) < 1e-5
    assert 0 < r.w_prime <= 1
    try:
        from scipy import stats
    except ImportError:
        return
    # W' tracks Shapiro-Wilk W on the same sample
    assert abs(r.w_prime - stats.shapiro(x).statistic) < 0.05


def test_normality_suite_agrees_on_uniform_data(spark, sf_dir):
    """Purchase values are uniform-ish — all three tests must reject
    normality together on any reasonable sample, and W' must sit well
    below the ~0.99 acceptance region."""
    from arrow_supercluster_spark.plans.registry_ext193 import (
        q_anderson_darling,
        q_lilliefors,
        q_shapiro_francia,
    )

    [ad] = q_anderson_darling(spark, sf_dir).collect()
    [lf] = q_lilliefors(spark, sf_dir).collect()
    [sf] = q_shapiro_francia(spark, sf_dir).collect()
    assert ad.reject_5pct and lf.reject_5pct
    assert sf.w_prime < 0.99
