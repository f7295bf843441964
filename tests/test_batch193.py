"""Batch-193 tests: streaming≡batch for the stream-stream interval
join, Pettitt brute-force replay, von Neumann replay."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import datetime
import math

from pyspark.sql import functions as F


def _events(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    return read_events(spark, sf_dir)


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext198 import (
        _SSJ_INTERVAL_MIN,
        q_stream_stream_join,
    )

    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pt")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("ct")
    )
    delta = F.expr(f"INTERVAL {_SSJ_INTERVAL_MIN} MINUTES")
    batch = (
        p.join(
            c,
            (F.col("cu") == F.col("pu"))
            & (F.col("ct") >= F.col("pt") - delta)
            & (F.col("ct") <= F.col("pt") + delta),
        )
        .groupBy(F.col("pu").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
        .collect()
    )
    streamed = q_stream_stream_join(spark, sf_dir).collect()
    assert [(r.user_id, r.n_pairs) for r in streamed] == [
        (r.user_id, r.n_pairs) for r in batch
    ]
    assert len(streamed) > 0


def _daily_purchases(spark, sf_dir):
    rows = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    return sorted((r.d, r.x) for r in rows)


def test_pettitt_matches_brute_force(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext198 import (
        _PT_SIG,
        q_pettitt_test,
    )

    daily = _daily_purchases(spark, sf_dir)
    xs = [x for _, x in daily]
    n = len(xs)

    def sign(v):
        return (v > 0) - (v < 0)

    best_k, best_day = -1, None
    for t in range(n - 1):  # boundary after index t
        u = sum(
            sign(xs[i] - xs[j])
            for i in range(t + 1)
            for j in range(t + 1, n)
        )
        if abs(u) > best_k:
            best_k, best_day = abs(u), daily[t][0]
    p = 2.0 * math.exp(-6.0 * best_k**2 / (n**3 + n**2))
    [r] = q_pettitt_test(spark, sf_dir).collect()
    assert r.n_days == n
    assert r.k_stat == best_k
    assert r.change_day == best_day.isoformat()
    assert abs(r.p_approx - round(p, 6)) < 1e-9
    assert r.significant == (p < _PT_SIG)


def test_von_neumann_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext198 import (
        q_von_neumann,
    )

    daily = _daily_purchases(spark, sf_dir)
    xs = [x for _, x in daily]
    n = len(xs)
    mean = sum(xs) / n
    ssd = sum((b - a) ** 2 for a, b in zip(xs, xs[1:]))
    sxx = sum((x - mean) ** 2 for x in xs)
    eta = ssd / sxx
    z = (eta - 2.0) / math.sqrt(4.0 * (n - 2) / (n * n - 1))
    [r] = q_von_neumann(spark, sf_dir).collect()
    assert r.n == n
    assert abs(r.eta - round(eta, 6)) < 1e-6
    assert abs(r.z - round(z, 6)) < 1e-6
    assert r.random_ok == (abs(z) < 1.96)
    assert r.eta > 0
