"""Batch-156 tests: spectral entropy python/periodogram oracle + white
vs periodic extremes, Engle-Granger vs python OLS/DF replay, STL-lite
reconstruction identities."""

import datetime

import numpy as np


def _daily(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    rows.sort(key=lambda r: r.d)
    return rows


def _write_daily_series(spark, tmp_path, counts):
    rows = []
    eid = 0
    for d, n in enumerate(counts, start=1):
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


def test_spectral_entropy_python_oracle_and_periodic_extreme(
    spark, sf_dir, tmp_path
):
    from arrow_supercluster_spark.plans.registry_ext161 import (
        _SE_K,
        q_spectral_entropy,
    )

    r = q_spectral_entropy(spark, sf_dir).collect()[0]
    rows = _daily(spark, sf_dir)
    c = np.array([row.c for row in rows], float)
    d = np.array([row.d for row in rows], float)
    n = len(c)
    e = c - c.mean()
    p = np.array(
        [
            (e * np.cos(2 * np.pi * k * d / n)).sum() ** 2
            + (e * np.sin(2 * np.pi * k * d / n)).sum() ** 2
            for k in range(1, _SE_K + 1)
        ]
    )
    q = p / p.sum()
    h = -(q[q > 0] * np.log(q[q > 0])).sum()
    assert r.n_days == n
    assert abs(r.spectral_entropy - h) < 1e-4
    assert abs(r.normalized_entropy - h / np.log(_SE_K)) < 1e-4
    assert 0 <= r.normalized_entropy <= 1

    # a pure 7-day cosine cycle concentrates the spectrum => entropy
    # far below the fixture's broadband series
    periodic = [200 + 80 * np.cos(2 * np.pi * t / 7.5) for t in range(30)]
    _write_daily_series(spark, tmp_path, periodic)
    rp = q_spectral_entropy(spark, str(tmp_path)).collect()[0]
    assert rp.normalized_entropy < r.normalized_entropy
    assert rp.normalized_entropy < 0.5


def test_engle_granger_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext161 import (
        _EG_CRIT,
        q_engle_granger,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_engle_granger(spark, sf_dir).collect()[0]
    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("x"),
            (
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                ) / 100.0
            ).alias("y"),
        )
        .collect()
    )
    rows.sort(key=lambda v: v.d)
    x = np.array([v.x for v in rows], float)
    y = np.array([v.y for v in rows], float)
    n = len(x)
    beta = ((x * y).sum() - x.sum() * y.sum() / n) / (
        (x * x).sum() - x.sum() ** 2 / n
    )
    alpha = y.mean() - beta * x.mean()
    e = y - (alpha + beta * x)
    days = {v.d: i for i, v in enumerate(rows)}
    de, el = [], []
    for v in rows:
        if v.d - 1 in days:
            de.append(e[days[v.d]] - e[days[v.d - 1]])
            el.append(e[days[v.d - 1]])
    de, el = np.array(de), np.array(el)
    gamma = (el * de).sum() / (el * el).sum()
    sse = ((de - gamma * el) ** 2).sum()
    t = gamma / np.sqrt(sse / (len(de) - 1) / (el * el).sum())
    assert r.n_steps == len(de)
    assert abs(r.beta - beta) < 1e-4
    assert abs(r.df_gamma - gamma) < 1e-4
    assert abs(r.df_tstat - t) < 1e-3
    assert r.cointegrated == (t < _EG_CRIT)
    # gamma must be mean-reverting-negative for any stationary residual
    assert -2 < r.df_gamma < 0


def test_stl_lite_reconstruction(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext161 import q_stl_lite

    rows = q_stl_lite(spark, sf_dir).collect()
    daily = {r.d: r.c for r in _daily(spark, sf_dir)}
    lo, hi = min(daily), max(daily)
    assert [r.d for r in rows] == list(range(lo + 3, hi - 2))
    for r in rows:
        # additive identity: observed = trend + seasonal + remainder
        assert abs(
            r.observed - (r.trend + r.seasonal + r.remainder)
        ) < 2e-4
        # trend is the centered 7-day mean
        want = np.mean([daily[d] for d in range(r.d - 3, r.d + 4)])
        assert abs(r.trend - want) < 1e-3
    # seasonal components are re-centered: weekday means sum to ~0
    seas = {}
    for r in rows:
        seas[(r.d - 1) % 7] = r.seasonal
    assert abs(sum(seas.values())) < 1e-2
