"""Batch-105 tests: OHLC bars, gradient-descent linreg, SAX — python
oracles and convergence/shape properties."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.sources.tables import read_events


def test_tumbling_ohlc_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext110 import q_tumbling_ohlc

    got = {(r.event_type, r.day): r
           for r in q_tumbling_ohlc(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "ts", "value"
    ).collect()
    groups = defaultdict(list)
    for r in ev:
        groups[(r.event_type, r.day)].append((r.ts, r.value))
    assert set(got) == set(groups)
    for k, rows in groups.items():
        rows.sort()
        vals = [v for _, v in rows]
        r = got[k]
        assert r.open == rows[0][1] and r.close == rows[-1][1]
        assert abs(r.high - round(max(vals), 4)) < 1e-9
        assert abs(r.low - round(min(vals), 4)) < 1e-9
        assert r.volume == len(vals)
        assert r.low <= r.open <= r.high and r.low <= r.close <= r.high


def test_gd_linreg_converges_and_matches_python(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext110 import (
        _GD_ITERS,
        _GD_LR,
        q_gd_linreg,
    )

    r = q_gd_linreg(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    xs = [d.n_chars / 100.0 for d in docs]
    ys = [len(d.text) / 100.0 for d in docs]
    n = len(xs)
    w = b = 0.0
    mses = [sum((w * x + b - y) ** 2 for x, y in zip(xs, ys)) / n]
    for _ in range(_GD_ITERS):
        dw = 2.0 / n * sum((w * x + b - y) * x for x, y in zip(xs, ys))
        db = 2.0 / n * sum(w * x + b - y for x, y in zip(xs, ys))
        w -= _GD_LR * dw
        b -= _GD_LR * db
        mses.append(sum((w * x + b - y) ** 2 for x, y in zip(xs, ys)) / n)
    assert abs(r.w - w) < 1e-4 and abs(r.b - b) < 1e-4
    assert abs(r.mse - mses[-1]) < 1e-4
    # descent property: MSE strictly decreased from the zero init
    assert mses[-1] < mses[0] * 0.5
    # and monotonically (lr is in the stable region for this scaling)
    assert all(b2 <= a2 + 1e-12 for a2, b2 in zip(mses, mses[1:]))


def test_sax_symbolic_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext110 import (
        _SAX_BREAK,
        _SAX_SEGS,
        q_sax_symbolic,
    )

    got = {r.seg: r for r in q_sax_symbolic(spark, sf_dir).collect()}
    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .count()
        .orderBy("d")
        .collect()
    )
    ys = [float(r["count"]) for r in rows]
    mu = sum(ys) / len(ys)
    sd = math.sqrt(sum((y - mu) ** 2 for y in ys) / (len(ys) - 1))
    d0 = rows[0].d
    span = (rows[-1].d - d0).days + 1
    segs = defaultdict(list)
    for r, y in zip(rows, ys):
        seg = int((r.d - d0).days * _SAX_SEGS / span)
        segs[seg].append((y - mu) / sd)
    assert set(got) == set(segs)
    total_days = 0
    for seg, zs in segs.items():
        m = sum(zs) / len(zs)
        r = got[seg]
        assert abs(r.paa_mean - m) < 1e-5
        assert r.n_days == len(zs)
        want = (
            "a" if m < -_SAX_BREAK else
            "b" if m < 0 else
            "c" if m < _SAX_BREAK else "d"
        )
        assert r.symbol == want
        total_days += r.n_days
    assert total_days == len(ys)
