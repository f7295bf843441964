"""Batch-161 tests: Ljung-Box vs python (and scipy acorr if present),
ARCH LM python replay + crafted vol-clustering detection, variance
ratio brute force + random-walk null."""

import datetime

import numpy as np


def _resid(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    rows.sort(key=lambda r: r.d)
    x = np.array([r.d for r in rows], float)
    y = np.array([r.c for r in rows], float)
    n = len(x)
    sl = ((x * y).sum() - x.sum() * y.sum() / n) / (
        (x * x).sum() - x.sum() ** 2 / n
    )
    b0 = y.mean() - sl * x.mean()
    return {int(d): e for d, e in zip(x, y - (b0 + sl * x))}


def test_ljung_box_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext166 import (
        _LB_CRIT,
        _LB_H,
        q_ljung_box,
    )

    r = q_ljung_box(spark, sf_dir).collect()[0]
    e = _resid(spark, sf_dir)
    n = len(e)
    den = sum(v * v for v in e.values())
    lb = 0.0
    for k in range(1, _LB_H + 1):
        num = sum(
            e[d] * e[d + k] for d in e if d + k in e
        )
        rk = num / den
        lb += rk * rk / (n - k)
    lb *= n * (n + 2)
    assert r.n_days == n
    assert abs(r.ljung_box_q - lb) < 1e-3
    assert r.residuals_not_white == (lb > _LB_CRIT)


def test_arch_lm_python_replay_and_crafted_clustering(
    spark, sf_dir, tmp_path
):
    from arrow_supercluster_spark.plans.registry_ext166 import (
        _ARCH_CRIT,
        q_arch_lm,
    )

    r = q_arch_lm(spark, sf_dir).collect()[0]
    e = _resid(spark, sf_dir)
    u = {d: v * v for d, v in e.items()}
    pairs = [(u[d - 1], u[d]) for d in u if d - 1 in u]
    ul = np.array([a for a, _ in pairs])
    uu = np.array([b for _, b in pairs])
    lm = len(pairs) * np.corrcoef(ul, uu)[0, 1] ** 2
    assert r.n_pairs == len(pairs)
    assert abs(r.arch_lm - lm) < 1e-3
    assert r.arch_effect == (lm > _ARCH_CRIT)

    # crafted volatility clustering: a zigzag with smoothly GROWING
    # amplitude — residuals alternate sign but e² = (2+d)² rises
    # smoothly, so lag-1 corr(e², e²) ≈ 1 (deterministic; a
    # regime-SWITCH draw was tried first but chi²(1)-tailed e² made
    # the sample correlation collapse at n=29)
    rows = []
    eid = 0
    for d in range(1, 31):
        nval = 200 + (2 + d) * (1 if d % 2 == 0 else -1)
        for i in range(nval):
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
    rc = q_arch_lm(spark, str(tmp_path)).collect()[0]
    assert rc.arch_effect, "regime-switching variance must trip ARCH LM"


def test_variance_ratio_bruteforce(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext166 import (
        _VR_Q,
        q_variance_ratio,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_variance_ratio(spark, sf_dir).collect()[0]
    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    rows.sort(key=lambda v: v.d)
    c = np.array([v.c for v in rows], float)
    days = {v.d: i for i, v in enumerate(rows)}
    x = c - c.mean()
    v1 = (x**2).sum() / (len(x) - 1)
    sums = []
    for v in rows:
        win = [days.get(v.d + j) for j in range(_VR_Q)]
        if all(w is not None for w in win):
            sums.append(sum(x[w] for w in win))
    sums = np.array(sums)
    vq = (sums**2).sum() / (len(sums) - 1)
    vr = vq / (_VR_Q * v1)
    assert r.n_windows == len(sums)
    assert abs(r.variance_ratio - vr) < 1e-3
    assert r.mean_reverting == (vr < 1)
    # the stationary daily-count series must NOT look like a random
    # walk's increments held positive correlation — VR stays below ~1.5
    assert r.variance_ratio < 1.5
