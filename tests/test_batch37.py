"""Batch-37 tests: EMA closed form vs sequential recurrence, Benford
shares, runs-test vs Python reference."""

import math
from collections import Counter

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def _daily(spark, sf_dir):
    return (
        read_events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("d")
        .collect()
    )


def test_ema_matches_sequential_recurrence(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    a = 0.3
    ema, ref = 0.0, []
    for r in daily:
        ema = a * r.n + (1 - a) * ema
        ref.append(ema)
    got = sorted(
        REGISTRY["q_ema_daily"].spark(spark, sf_dir).collect(),
        key=lambda r: r.day_us,
    )
    assert len(got) == len(ref)
    for g, e in zip(got, ref):
        assert abs(g.ema - e) < 1e-4, (g.day_us, g.ema, e)


def test_benford_shares(spark, sf_dir):
    vals = [
        r.value
        for r in read_events(spark, sf_dir)
        .filter(F.col("value").isNotNull() & (F.col("value") >= 1))
        .collect()
    ]
    first = Counter(str(f"{v:.6f}")[0] for v in vals)
    got = {r.d: r for r in REGISTRY["q_benford"].spark(spark, sf_dir).collect()}
    total = sum(first.values())
    for ds, n in first.items():
        d = int(ds)
        assert got[d].n == n
        assert abs(got[d].observed - n / total) < 1.01e-6
        assert abs(got[d].benford - math.log10(1 + 1 / d)) < 1.01e-6
    assert abs(sum(r.observed for r in got.values()) - 1.0) < 1e-4


def test_runs_test_reference(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    ns = [r.n for r in daily]
    s = sorted(ns)
    m = (
        s[len(s) // 2]
        if len(s) % 2 == 1
        else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
    )
    signs = [1 if n > m else 0 for n in ns if n != m]
    r_count = sum(
        1 for i, x in enumerate(signs) if i == 0 or signs[i - 1] != x
    )
    n1, n0 = sum(signs), len(signs) - sum(signs)
    row = REGISTRY["q_runs_test"].spark(spark, sf_dir).collect()[0]
    assert (row.r, row.n0, row.n1) == (r_count, n0, n1)
    exp_r = 2 * n0 * n1 / (n0 + n1) + 1
    var_r = (
        2 * n0 * n1 * (2 * n0 * n1 - n0 - n1)
        / ((n0 + n1) ** 2 * (n0 + n1 - 1))
    )
    assert abs(row.z - (r_count - exp_r) / math.sqrt(var_r)) < 1e-5
