"""Batch-148 tests: sweep-line concurrency vs brute force, Page-Hinkley
crafted-drift behavior, Croston recursion vs direct python EWMA."""

import datetime

import numpy as np


def test_max_concurrency_bruteforce(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext153 import (
        _MC_MINUTES,
        q_max_concurrency,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    r = q_max_concurrency(spark, sf_dir).collect()[0]
    ts = [row.ts for row in read_events(spark, sf_dir).select("ts").collect()]
    events = []
    delta = datetime.timedelta(minutes=_MC_MINUTES)
    for t in ts:
        events.append((t, 1))
        events.append((t + delta, -1))
    events.sort()  # (t, delta): -1 sorts before +1 at the same instant
    live = peak = 0
    first_at = None
    for t, d in events:
        live += d
        if live > peak:
            peak = live
            first_at = t
    assert r.n_intervals == len(ts)
    assert r.max_concurrent == peak
    assert r.first_peak_ts == first_at


def test_page_hinkley_python_oracle_and_crafted_drift(spark, sf_dir, tmp_path):
    from arrow_supercluster_spark.plans.registry_ext153 import (
        _PH_DELTA,
        _PH_LAMBDA,
        q_page_hinkley,
    )

    rows = q_page_hinkley(spark, sf_dir).collect()
    xs = [row.daily_mean for row in rows]
    # python oracle on the rounded daily means (close enough at 1e-3
    # because rounding only perturbs inputs by 5e-5)
    m = 0.0
    mins, phs = [], []
    run = []
    for x in xs:
        run.append(x)
        m += x - float(np.mean(run)) - _PH_DELTA
        mins.append(min(mins[-1], m) if mins else m)
        phs.append(m - mins[-1])
    for row, ph in zip(rows, phs):
        assert abs(row.ph_t - ph) < 5e-3
        assert row.alarm == (row.ph_t > _PH_LAMBDA)

    # crafted drift: flat mean 50 for days 1-19, then +30 shift
    ev = []
    eid = 0
    for d in range(1, 31):
        base = 50.0 if d < 20 else 80.0
        for i in range(10):
            ev.append(
                (
                    eid,
                    datetime.datetime(2024, 1, d, 10, i),
                    1,
                    "purchase",
                    base + (i - 4.5) * 0.2,  # tiny symmetric spread
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")
    rows = q_page_hinkley(spark, str(tmp_path)).collect()
    alarms = [row.d for row in rows if row.alarm]
    assert alarms, "the injected shift must trip the alarm"
    assert min(alarms) >= 20, "no alarm before the shift"


def test_croston_matches_sequential_ewma(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext153 import (
        _CR_ALPHA,
        _CR_PREMIUM,
        q_croston,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_croston(spark, sf_dir).collect()[0]
    daily = (
        read_events(spark, sf_dir)
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") > _CR_PREMIUM)
        )
        .groupBy(F.dayofmonth("ts").alias("t"))
        .agg(F.count(F.lit(1)).alias("y"))
        .collect()
    )
    daily.sort(key=lambda x: x.t)
    assert r.n_demand_days == len(daily) > 1
    # direct sequential Croston recursion
    z = p = None
    prev_t = 0
    for row in daily:
        q = row.t - prev_t
        prev_t = row.t
        if z is None:
            z, p = float(row.y), float(q)
        else:
            z = z + _CR_ALPHA * (row.y - z)
            p = p + _CR_ALPHA * (q - p)
    assert abs(r.smoothed_size - z) < 1e-3
    assert abs(r.smoothed_interval - p) < 1e-3
    assert abs(r.croston_forecast - z / p) < 1e-3
