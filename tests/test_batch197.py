"""Batch-197 tests: CCF replay + lag-0 ≡ Pearson check, tail-dependence
replay, empirical-copula replay + Fréchet bounds."""

import math

from pyspark.sql import functions as F


def _daily_xy(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("y"),
        )
        .collect()
    )
    rows = sorted((r.d, r.x, r.y) for r in rows)
    return [x for _, x, _ in rows], [y for _, _, y in rows]


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    return (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


def test_cross_correlation_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext202 import (
        _CCF_MAX_LAG,
        q_cross_correlation,
    )

    xs, ys = _daily_xy(spark, sf_dir)
    n = len(xs)
    want = {}
    for lag in range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1):
        pairs = [
            (xs[t], ys[t + lag])
            for t in range(n)
            if 0 <= t + lag < n
        ]
        want[lag] = (
            len(pairs),
            _pearson([a for a, _ in pairs], [b for _, b in pairs]),
        )
    peak = max(abs(r) for _, r in want.values())
    got = q_cross_correlation(spark, sf_dir).collect()
    assert [r.lag for r in got] == sorted(want)
    for r in got:
        m, rr = want[r.lag]
        assert r.n == m
        assert abs(r.ccf - round(rr, 6)) < 1e-9
        assert r.is_peak == (abs(rr) == peak)
    # lag 0 is plain Pearson of the two series
    assert abs(want[0][1] - _pearson(xs, ys)) < 1e-12


def _t1q(vals, pq):
    s = sorted(vals)
    n = len(s)
    cum = 0
    seen = None
    for i, v in enumerate(s):
        cum = i + 1
        if 100 * cum >= pq * n:
            seen = v
            break
    return seen


def test_tail_dependence_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext202 import (
        _TD_QS,
        q_tail_dependence,
    )

    xs, ys = _daily_xy(spark, sf_dir)
    got = {round(r.q, 2): r for r in q_tail_dependence(spark, sf_dir).collect()}
    assert sorted(got) == [pq / 100 for pq in _TD_QS]
    for pq in _TD_QS:
        xq, yq = _t1q(xs, pq), _t1q(ys, pq)
        xl, yl = _t1q(xs, 100 - pq), _t1q(ys, 100 - pq)
        ju = sum(1 for a, b in zip(xs, ys) if a > xq and b > yq)
        du = sum(1 for b in ys if b > yq)
        jl = sum(1 for a, b in zip(xs, ys) if a <= xl and b <= yl)
        dl = sum(1 for b in ys if b <= yl)
        r = got[pq / 100]
        assert r.n_joint_u == ju
        if du:
            assert abs(r.lambda_u - round(ju / du, 6)) < 1e-9
            assert 0 <= r.lambda_u <= 1
        if dl:
            assert abs(r.lambda_l - round(jl / dl, 6)) < 1e-9


def test_empirical_copula_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext202 import (
        _EC_GRID,
        q_empirical_copula,
    )

    xs, ys = _daily_xy(spark, sf_dir)
    n = len(xs)
    fx = [sum(1 for b in xs if b <= a) for a in xs]
    fy = [sum(1 for b in ys if b <= a) for a in ys]
    got = {(round(r.u, 2), round(r.v, 2)): r
           for r in q_empirical_copula(spark, sf_dir).collect()}
    assert len(got) == len(_EC_GRID) ** 2
    for u in _EC_GRID:
        for v in _EC_GRID:
            c = sum(
                1
                for i in range(n)
                if 100 * fx[i] <= u * n and 100 * fy[i] <= v * n
            ) / n
            r = got[(u / 100, v / 100)]
            assert abs(r.copula - round(c, 6)) < 1e-9
            assert abs(r.independence - u * v / 10000.0) < 1e-12
            assert abs(r.excess - round(c - u * v / 10000.0, 6)) < 1e-9
            # Fréchet-Hoeffding bounds
            uu, vv = u / 100, v / 100
            assert max(uu + vv - 1, 0) - 1e-2 <= r.copula <= min(uu, vv) + 1e-2
