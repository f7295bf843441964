"""Batch-159 tests: Huber IRLS python replay + outlier resistance,
Qn vs brute-force order statistic (and scipy? Qn not in scipy — pure
python), Hodges-Lehmann brute force."""

import datetime

import numpy as np


def test_huber_mean_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext164 import (
        _HM_C,
        _HM_ITERS,
        q_huber_mean,
    )

    r = q_huber_mean(spark, sf_dir).collect()[0]
    vals = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .selectExpr("CAST(round(value*100) AS LONG) / 100.0 AS x")
        .collect()
    )
    x = np.array([float(v.x) for v in vals])
    med = np.percentile(x, 50)
    s = 1.4826 * np.percentile(np.abs(x - med), 50)
    mu = med
    for _ in range(_HM_ITERS):
        w = np.minimum(1.0, _HM_C * s / np.maximum(np.abs(x - mu), 1e-12))
        mu = (w * x).sum() / w.sum()
    assert r.n == len(x)
    assert abs(r.median - med) < 1e-3
    assert abs(r.mad_scale - s) < 1e-3
    assert abs(r.huber_mean - mu) < 1e-3
    # right-skewed values: huber sits between median and mean
    assert r.median <= r.huber_mean <= r.mean or (
        r.mean <= r.huber_mean <= r.median
    )


def test_huber_resists_crafted_outliers(spark, tmp_path):
    from arrow_supercluster_spark.plans.registry_ext164 import q_huber_mean

    rows = []
    for i in range(200):
        v = 50.0 + (i % 11) - 5  # tight cluster around 50
        rows.append(
            (i, datetime.datetime(2024, 1, 3, 10, 0), i, "purchase", v, "{}")
        )
    for i in range(10):  # 5% gross outliers at 5000
        rows.append(
            (
                1000 + i,
                datetime.datetime(2024, 1, 4, 10, 0),
                1000 + i,
                "purchase",
                5000.0,
                "{}",
            )
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    r = q_huber_mean(spark, str(tmp_path)).collect()[0]
    assert r.mean > 250  # the outliers drag the mean far away
    assert abs(r.huber_mean - 50) < 3  # huber stays home
    assert abs(r.median - 50) < 2


def test_qn_scale_bruteforce(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext164 import (
        _QN_D,
        q_qn_scale,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_qn_scale(spark, sf_dir).collect()[0]
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    c = np.array([row.c for row in daily], float)
    n = len(c)
    diffs = sorted(
        abs(c[i] - c[j]) for i in range(n) for j in range(i + 1, n)
    )
    h = n // 2 + 1
    k = h * (h - 1) // 2
    assert r.n_days == n and r.order_stat_k == k
    assert abs(r.qn - _QN_D * diffs[k - 1]) < 1e-3
    assert abs(r.classic_sd - c.std(ddof=1)) < 1e-3
    assert r.qn_over_sd > 0


def test_hodges_lehmann_bruteforce(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext164 import (
        q_hodges_lehmann,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_hodges_lehmann(spark, sf_dir).collect()[0]
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    c = np.array([row.c for row in daily], float)
    n = len(c)
    walsh = [
        (c[i] + c[j]) / 2 for i in range(n) for j in range(i, n)
    ]
    assert r.n_walsh == n * (n + 1) // 2
    assert abs(r.hodges_lehmann - np.percentile(walsh, 50)) < 1e-3
    assert abs(r.plain_median - np.percentile(c, 50)) < 1e-3
    # HL lies within the data hull
    assert min(c) <= r.hodges_lehmann <= max(c)
