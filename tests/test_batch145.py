"""Batch-145 tests: Jarque-Bera vs scipy, Breusch-Pagan and Chow vs
independent numpy OLS oracles."""

import numpy as np


def _daily_counts(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    rows.sort(key=lambda r: r.d)
    return np.array([r.d for r in rows], float), np.array(
        [r.c for r in rows], float
    )


def _ols_resid(x, y):
    n = len(x)
    sl = ((x * y).sum() - x.sum() * y.sum() / n) / (
        (x * x).sum() - x.sum() ** 2 / n
    )
    b0 = y.mean() - sl * x.mean()
    return y - (b0 + sl * x)


def test_jarque_bera_matches_scipy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext150 import q_jarque_bera

    r = q_jarque_bera(spark, sf_dir).collect()[0]
    vals = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .selectExpr("CAST(round(value) AS LONG) AS x")
        .collect()
    )
    x = np.array([v.x for v in vals], float)
    assert r.n == len(x)
    # moment cross-check (population moments, matching JB's definition)
    m = x.mean()
    m2, m3, m4 = ((x - m) ** 2).mean(), ((x - m) ** 3).mean(), (
        (x - m) ** 4
    ).mean()
    skew, exk = m3 / m2**1.5, m4 / m2**2 - 3
    assert abs(r.skewness - skew) < 1e-3
    assert abs(r.excess_kurtosis - exk) < 1e-3
    jb = len(x) / 6 * (skew**2 + exk**2 / 4)
    assert abs(r.jarque_bera - jb) < max(1e-2, abs(jb) * 1e-3)
    assert r.normal_rejected == (jb > 5.991)
    try:
        from scipy import stats
    except ImportError:
        return
    sp = stats.jarque_bera(x)
    assert abs(r.jarque_bera - sp.statistic) < max(1e-2, sp.statistic * 1e-3)


def test_breusch_pagan_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext150 import (
        q_breusch_pagan,
    )

    r = q_breusch_pagan(spark, sf_dir).collect()[0]
    x, y = _daily_counts(spark, sf_dir)
    e2 = _ols_resid(x, y) ** 2
    # LM = n * R^2 of e^2 on x
    lm = len(x) * np.corrcoef(x, e2)[0, 1] ** 2
    assert r.n_days == len(x)
    assert abs(r.bp_lm - lm) < 1e-3
    assert r.heteroscedastic == (lm > 3.841)


def test_chow_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext150 import (
        _CHOW_CRIT,
        _CHOW_SPLIT,
        q_chow_test,
    )

    r = q_chow_test(spark, sf_dir).collect()[0]
    x, y = _daily_counts(spark, sf_dir)
    lo, hi = x < _CHOW_SPLIT, x >= _CHOW_SPLIT

    def ssr(xs, ys):
        return (_ols_resid(xs, ys) ** 2).sum()

    s1, s2, sf_ = ssr(x[lo], y[lo]), ssr(x[hi], y[hi]), ssr(x, y)
    f = ((sf_ - s1 - s2) / 2) / ((s1 + s2) / (len(x) - 4))
    assert r.n1 == lo.sum() and r.n2 == hi.sum()
    assert abs(r.ssr_split - (s1 + s2)) < 1e-2
    assert abs(r.ssr_pooled - sf_) < 1e-2
    assert abs(r.chow_f - f) < 1e-3
    assert r.break_detected == (f > _CHOW_CRIT)


def test_chow_detects_a_crafted_break(spark, tmp_path):
    """A synthetic series with a hard slope break at the split day must
    reject; sanity that the statistic moves the right way."""
    import datetime

    from arrow_supercluster_spark.plans.registry_ext150 import (
        _CHOW_SPLIT,
        q_chow_test,
    )

    rows = []
    eid = 0
    for d in range(1, 31):
        # deterministic jitter keeps per-regime SSR > 0 (a perfect fit
        # would zero the F denominator)
        n = (10 + d if d < _CHOW_SPLIT else 200 - 5 * d) + d % 3
        for i in range(n):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, d, 12, 0, 0),
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
    r = q_chow_test(spark, str(tmp_path)).collect()[0]
    assert r.break_detected
    assert r.chow_f > 100  # a hard break, not a marginal one
