"""Batch-154 tests: Levene vs scipy, Tukey HSD vs scipy, PACF vs an
independent Durbin-Levinson replay + a crafted AR(1) cutoff check."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import numpy as np


def _vals_by_group(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type AS g", "CAST(round(value*100) AS LONG) AS c")
        .collect()
    )
    by = {}
    for r in rows:
        by.setdefault(r.g, []).append(r.c)
    return {g: np.array(v, float) for g, v in by.items()}


def test_levene_matches_scipy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext159 import (
        _LV_CRIT,
        q_levene,
    )

    r = q_levene(spark, sf_dir).collect()[0]
    by = _vals_by_group(spark, sf_dir)
    assert r.k == len(by)
    assert r.n == sum(len(v) for v in by.values())
    try:
        from scipy import stats
    except ImportError:
        return
    w, _ = stats.levene(*by.values(), center="median")
    assert abs(r.levene_w - w) < 1e-3
    assert r.variances_differ == (w > _LV_CRIT)


def test_tukey_hsd_matches_scipy_pattern(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext159 import q_tukey_hsd

    rows = q_tukey_hsd(spark, sf_dir).collect()
    by = _vals_by_group(spark, sf_dir)
    groups = sorted(by)
    assert len(rows) == len(groups) * (len(groups) - 1) // 2
    for row in rows:
        md = by[row.group_a].mean() / 100 - by[row.group_b].mean() / 100
        assert abs(row.mean_diff - md) < 1e-3
        assert row.significant == (
            abs(row.mean_diff) > row.hsd_threshold
        )
    try:
        from scipy import stats
    except ImportError:
        return
    sp = stats.tukey_hsd(*[by[g] / 100 for g in groups])
    for row in rows:
        i, j = groups.index(row.group_a), groups.index(row.group_b)
        assert abs(row.mean_diff - sp.statistic[i, j]) < 1e-3
        # scipy uses the exact studentized-range quantile at the real
        # df; our q(5, inf) constant is slightly smaller, so agreement
        # on the verdict is expected away from the boundary
        if abs(sp.pvalue[i, j] - 0.05) > 0.02:
            assert row.significant == (sp.pvalue[i, j] < 0.05)


def test_pacf_durbin_levinson_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext159 import (
        _PACF_LAGS,
        q_pacf,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    rows = {r.lag: r for r in q_pacf(spark, sf_dir).collect()}
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    daily.sort(key=lambda x: x.d)
    x = np.array([r.c for r in daily], float)
    e = x - x.mean()
    den = (e**2).sum()
    acf = [
        (e[:-k] * e[k:]).sum() / den for k in range(1, _PACF_LAGS + 1)
    ]
    # independent DL
    pacf = []
    phi = []
    for k in range(1, _PACF_LAGS + 1):
        if k == 1:
            pk = acf[0]
            phi = [pk]
        else:
            num = acf[k - 1] - sum(
                phi[j] * acf[k - 2 - j] for j in range(k - 1)
            )
            d = 1 - sum(phi[j] * acf[j] for j in range(k - 1))
            pk = num / d
            phi = [
                phi[j] - pk * phi[k - 2 - j] for j in range(k - 1)
            ] + [pk]
        pacf.append(pk)
    assert set(rows) == set(range(1, _PACF_LAGS + 1))
    for k in range(1, _PACF_LAGS + 1):
        assert abs(rows[k].acf - acf[k - 1]) < 1e-5
        assert abs(rows[k].pacf - pacf[k - 1]) < 1e-5
    assert rows[1].acf == rows[1].pacf  # DL base case


def test_pacf_cuts_off_for_ar1(spark, tmp_path):
    """An AR(1)-like daily series: PACF(1) is large, PACF(2..) near 0 —
    the order-identification property the operator exists for."""
    import datetime

    from arrow_supercluster_spark.plans.registry_ext159 import q_pacf

    # AR(1) with a FIXED seeded innovation draw (deterministic test
    # fixture): c_t = 200 + 0.8*(c_{t-1} - 200) + w_t, w ~ N(0, 6)
    w = np.random.default_rng(7).normal(0, 6, 30)
    c = [200.0]
    for t in range(1, 30):
        c.append(200 + 0.8 * (c[-1] - 200) + w[t])
    rows = []
    eid = 0
    for d, n in enumerate(c, start=1):
        for i in range(int(round(n))):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, d, i % 24, i % 60),
                    1,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    got = {r.lag: r.pacf for r in q_pacf(spark, str(tmp_path)).collect()}
    assert got[1] > 0.5
    assert all(abs(got[k]) < abs(got[1]) / 2 for k in (2, 3, 4, 5))
