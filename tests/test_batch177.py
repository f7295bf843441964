"""Batch-177 tests: MoM replay + robustness property, trimmed-mean
replay vs scipy, Cox-Stuart sign replay, Bartlett vs scipy."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import numpy as np
from pyspark.sql import functions as F


def _values(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .select("event_type", "event_id", "value", F.to_date("ts").alias("day"))
        .collect()
    )
    by_t = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r)
    return by_t


def test_median_of_means_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext182 import (
        _MOM_K,
        q_median_of_means,
    )

    by_t = _values(spark, sf_dir)
    for r in q_median_of_means(spark, sf_dir).collect():
        rows = by_t[r.event_type]
        buckets = {}
        for x in rows:
            buckets.setdefault(x.event_id % _MOM_K, []).append(x.value)
        mus = sorted(np.mean(v) for v in buckets.values())
        k = len(mus)
        mom = (mus[(k - 1) // 2] + mus[k // 2]) / 2
        assert r.n_events == len(rows)
        assert r.k_buckets == k
        assert abs(r.mom - mom) < 2e-6
        assert abs(r.plain_mean - np.mean([x.value for x in rows])) < 2e-6
        # MoM of a well-behaved sample stays near the mean
        assert abs(r.mom - r.plain_mean) < 0.2 * abs(r.plain_mean) + 1.0


def test_trimmed_mean_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext182 import (
        _TM_HI,
        _TM_LO,
        q_trimmed_mean,
    )

    by_t = _values(spark, sf_dir)
    for r in q_trimmed_mean(spark, sf_dir).collect():
        c = np.array(
            [round(x.value * 100) for x in by_t[r.event_type]], dtype=float
        )
        lo = np.quantile(c, _TM_LO)  # numpy default = linear = type 7
        hi = np.quantile(c, _TM_HI)
        kept = c[(c >= lo) & (c <= hi)]
        assert r.n_total == len(c)
        assert r.n_kept == len(kept)
        assert abs(r.raw_mean - c.mean() / 100) < 2e-6
        assert abs(r.trimmed_mean - kept.mean() / 100) < 2e-6
        # trimming cannot move the center outside the kept bounds
        assert lo / 100 - 1e-9 <= r.trimmed_mean <= hi / 100 + 1e-9


def test_cox_stuart_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext182 import (
        q_cox_stuart,
    )

    by_t = _values(spark, sf_dir)
    for r in q_cox_stuart(spark, sf_dir).collect():
        daily = {}
        for x in by_t[r.event_type]:
            daily[x.day] = daily.get(x.day, 0) + 1
        series = [daily[d] for d in sorted(daily)]
        d = len(series)
        h = (d + 1) // 2
        signs = [
            np.sign(series[i + h] - series[i]) for i in range(d // 2)
        ]
        plus = sum(1 for s in signs if s > 0)
        minus = sum(1 for s in signs if s < 0)
        m = plus + minus
        z = 0.0 if m == 0 else (plus - m / 2) / np.sqrt(m / 4)
        assert r.n_pairs == len(signs)
        assert (r.n_plus, r.n_minus) == (plus, minus)
        assert abs(r.z - z) < 2e-6
        assert r.trending == (abs(z) > 1.96)


def test_bartlett_matches_scipy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext182 import q_bartlett

    by_t = _values(spark, sf_dir)
    groups = [
        np.array([round(x.value * 100) for x in v], dtype=float)
        for _, v in sorted(by_t.items())
    ]
    row = q_bartlett(spark, sf_dir).collect()[0]
    assert row.k == len(groups)
    assert row.n_total == sum(len(g) for g in groups)
    # independent replay of the closed form
    k = len(groups)
    nn = sum(len(g) for g in groups)
    vars_ = [g.var(ddof=1) for g in groups]
    sp2 = sum((len(g) - 1) * v for g, v in zip(groups, vars_)) / (nn - k)
    t = (
        (nn - k) * np.log(sp2)
        - sum((len(g) - 1) * np.log(v) for g, v in zip(groups, vars_))
    ) / (
        1
        + (sum(1 / (len(g) - 1) for g in groups) - 1 / (nn - k))
        / (3 * (k - 1))
    )
    assert abs(row.t_stat - t) < 1e-4
    assert row.reject_equal_var == (t > 9.488)
    try:
        from scipy.stats import bartlett
    except ImportError:
        return
    stat, _ = bartlett(*groups)
    assert abs(row.t_stat - stat) < 1e-4
