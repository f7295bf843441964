"""Batch-204 tests: L-moments vs the direct sorted-sample estimator,
GPD MOM replay + uniform-tail sanity, mean-excess replay + the
uniform-distribution linearity law."""

import math

from pyspark.sql import functions as F


def _cents(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.round(F.col("value") * 100).cast("long").alias("c"))
        .collect()
    )
    return sorted(r.c for r in rows)


def test_l_moments_match_direct_estimator(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext209 import (
        q_l_moments,
    )

    x = _cents(spark, sf_dir)
    n = len(x)
    b = [0.0] * 4
    for i, v in enumerate(x, start=1):
        b[0] += v
        b[1] += (i - 1) / (n - 1) * v
        b[2] += (i - 1) * (i - 2) / ((n - 1) * (n - 2)) * v
        b[3] += (
            (i - 1) * (i - 2) * (i - 3)
            / ((n - 1) * (n - 2) * (n - 3))
            * v
        )
    b = [v / n for v in b]
    l1 = b[0]
    l2 = 2 * b[1] - b[0]
    l3 = 6 * b[2] - 6 * b[1] + b[0]
    l4 = 20 * b[3] - 30 * b[2] + 12 * b[1] - b[0]
    [r] = q_l_moments(spark, sf_dir).collect()
    assert r.n == n
    assert abs(r.l1 - round(l1 / 100.0, 4)) < 1e-6
    assert abs(r.l2 - round(l2 / 100.0, 4)) < 1e-6
    assert abs(r.l_cv - round(l2 / l1, 6)) < 1e-6
    assert abs(r.l_skewness - round(l3 / l2, 6)) < 1e-6
    assert abs(r.l_kurtosis - round(l4 / l2, 6)) < 1e-6
    # Hosking bounds: lambda2 > 0, |tau3| < 1, tau4 in [-1/4(5tau3^2-1), 1)
    assert r.l2 > 0
    assert abs(r.l_skewness) < 1
    assert (
        0.25 * (5 * r.l_skewness**2 - 1) - 1e-9
        <= r.l_kurtosis
        < 1
    )


def test_gpd_pot_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext209 import (
        _GPD_Q10,
        _GPD_RET_Q,
        q_gpd_pot,
    )

    x = _cents(spark, sf_dir)
    n = len(x)
    cum = 0
    u = None
    seen = sorted(set(x))
    counts = {v: x.count(v) for v in seen}
    for v in seen:
        cum += counts[v]
        if 10 * cum >= _GPD_Q10 * n:
            u = v
            break
    ys = [v - u for v in x if v > u]
    k = len(ys)
    m = sum(ys) / k
    var = (sum(y * y for y in ys) - sum(ys) ** 2 / k) / (k - 1)
    xi = 0.5 * (1 - m * m / var)
    sigma = 0.5 * m * (m * m / var + 1)
    zeta = k / n
    lvl = u + sigma / xi * (((1 - _GPD_RET_Q) / zeta) ** (-xi) - 1)
    [r] = q_gpd_pot(spark, sf_dir).collect()
    assert r.n_exceedances == k
    assert abs(r.threshold - round(u / 100.0, 2)) < 1e-9
    assert abs(r.xi - round(xi, 6)) < 1e-6
    assert abs(r.sigma - round(sigma / 100.0, 4)) < 1e-4
    assert abs(r.return_level_999 - round(lvl / 100.0, 4)) < 1e-2
    # a bounded (uniform) tail has xi < 0 and a finite return level
    assert r.xi < 0.5
    assert r.return_level_999 > r.threshold


def test_mean_excess_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext209 import (
        _ME_GRID,
        q_mean_excess,
    )

    x = _cents(spark, sf_dir)
    n = len(x)
    seen = sorted(set(x))
    counts = {v: x.count(v) for v in seen}
    got = {round(r.q, 2): r for r in q_mean_excess(spark, sf_dir).collect()}
    assert sorted(got) == [p / 100 for p in _ME_GRID]
    vals = []
    for p in _ME_GRID:
        cum, u = 0, None
        for v in seen:
            cum += counts[v]
            if 100 * cum >= p * n:
                u = v
                break
        ys = [v - u for v in x if v > u]
        me = sum(ys) / len(ys)
        r = got[p / 100]
        assert r.n_exc == len(ys)
        assert abs(r.threshold - round(u / 100.0, 2)) < 1e-9
        assert abs(r.mean_excess - round(me / 100.0, 4)) < 1e-6
        vals.append((u, me))
    # mean excess is positive and bounded by the remaining range
    top = max(x)
    for u, me in vals:
        assert 0 < me <= top - u
