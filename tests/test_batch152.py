"""Batch-152 tests: Cramér's V vs scipy, CvM vs scipy, Grubbs python
oracle + crafted-outlier detection."""

import numpy as np


def test_cramers_v_matches_scipy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext157 import q_cramers_v

    r = q_cramers_v(spark, sf_dir).collect()[0]
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "lang")
        .collect()
    )
    srcs = sorted({d.source for d in docs})
    langs = sorted({d.lang for d in docs})
    tab = np.zeros((len(srcs), len(langs)))
    for d in docs:
        tab[srcs.index(d.source), langs.index(d.lang)] += 1
    n = tab.sum()
    e = np.outer(tab.sum(1), tab.sum(0)) / n
    chi2 = ((tab - e) ** 2 / e).sum()
    assert r.n == n and r.n_rows == len(srcs) and r.n_cols == len(langs)
    assert abs(r.chi2 - chi2) < 1e-3
    v = np.sqrt(chi2 / n / min(len(srcs) - 1, len(langs) - 1))
    assert abs(r.cramers_v - v) < 1e-5
    # Bergsma correction
    phi2c = max(
        0.0, chi2 / n - (len(srcs) - 1) * (len(langs) - 1) / (n - 1)
    )
    rc = len(srcs) - (len(srcs) - 1) ** 2 / (n - 1)
    cc = len(langs) - (len(langs) - 1) ** 2 / (n - 1)
    vc = np.sqrt(phi2c / min(rc - 1, cc - 1))
    assert abs(r.cramers_v_corrected - vc) < 1e-5
    assert r.cramers_v_corrected <= r.cramers_v + 1e-9
    try:
        from scipy.stats.contingency import association
    except ImportError:
        return
    assert abs(r.cramers_v - association(tab, method="cramer")) < 1e-5


def test_cvm_matches_scipy_and_null_holds(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext157 import q_cvm_test

    r = q_cvm_test(spark, sf_dir).collect()[0]
    vals = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .selectExpr(
            "CAST(round(value*100) AS LONG) AS v",
            "user_id % 2 = 0 AS in_x",
        )
        .collect()
    )
    x = np.array(sorted(row.v for row in vals if row.in_x), float)
    y = np.array(sorted(row.v for row in vals if not row.in_x), float)
    assert (r.n_x, r.n_y) == (len(x), len(y))
    # ECDF-form python replay over every observation
    zs = np.concatenate([x, y])
    fx = np.searchsorted(x, zs, side="right") / len(x)
    gy = np.searchsorted(y, zs, side="right") / len(y)
    t = (
        len(x) * len(y) / (len(x) + len(y)) ** 2
        * ((fx - gy) ** 2).sum()
    )
    assert abs(r.cvm_t - t) < 1e-5
    # same generator on both cohorts: the equality null should hold
    assert not r.reject_5pct
    try:
        from scipy import stats
    except ImportError:
        return
    sp = stats.cramervonmises_2samp(x, y, method="asymptotic")
    # scipy computes the rank form; equal to the ECDF form up to ties
    # (integer-cent ties are rare at this n)
    assert abs(r.cvm_t - sp.statistic) < 5e-3


def test_grubbs_python_oracle_and_crafted_outlier(spark, sf_dir, tmp_path):
    import datetime

    from arrow_supercluster_spark.plans.registry_ext157 import (
        _GRUBBS_CRIT,
        q_grubbs_test,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_grubbs_test(spark, sf_dir).collect()[0]
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    c = np.array([row.c for row in daily], float)
    mu, s = c.mean(), c.std(ddof=1)
    g = np.abs(c - mu) / s
    i = int(np.lexsort((np.array([row.d for row in daily]), -g))[0])
    assert r.n_days == len(daily)
    assert r.flagged_day == daily[i].d
    assert abs(r.grubbs_g - g[i]) < 1e-3
    assert r.outlier_detected == (g[i] > _GRUBBS_CRIT)

    # crafted: one day with 5x traffic must be flagged AND detected
    rows = []
    eid = 0
    for d in range(1, 31):
        n = 100 + d % 5 if d != 17 else 520
        for i2 in range(n):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, d, i2 % 24, i2 % 60),
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
    rc = q_grubbs_test(spark, str(tmp_path)).collect()[0]
    assert rc.flagged_day == 17
    assert rc.outlier_detected
