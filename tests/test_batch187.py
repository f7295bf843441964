"""Batch-187 tests: Welch-look replay, Thompson grid replay + allocation
invariants, IPS/SNIPS replay."""

import math

from pyspark.sql import functions as F


def _events(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    return read_events(spark, sf_dir)


def test_group_sequential_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext192 import (
        _GS_K,
        _GS_LOOKS,
        _OBF_C,
        _POCOCK_C,
        q_group_sequential,
    )

    rows = (
        _events(spark, sf_dir)
        .select(
            F.pmod("user_id", F.lit(2)).alias("trt"),
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("v"),
        )
        .collect()
    )
    got = {r.look: r for r in q_group_sequential(spark, sf_dir).collect()}
    assert sorted(got) == [k for k, _ in _GS_LOOKS]
    import datetime

    for k, lookdate in _GS_LOOKS:
        cut = datetime.date.fromisoformat(lookdate)
        stats = {}
        for t in (0, 1):
            vs = [r.v for r in rows if r.trt == t and r.d < cut]
            n = len(vs)
            s = sum(vs)
            ss = sum(v * v for v in vs)
            m = s / n
            var = (ss - s * s / n) / (n - 1)
            stats[t] = (n, m, var)
        n0, m0, v0 = stats[0]
        n1, m1, v1 = stats[1]
        z = (m1 - m0) / math.sqrt(v1 / n1 + v0 / n0)
        r = got[k]
        assert (r.n0, r.n1) == (n0, n1)
        assert abs(r.z - round(z, 6)) < 1e-9
        obf = _OBF_C * math.sqrt(_GS_K / k)
        assert abs(r.obf_bound - round(obf, 6)) < 1e-9
        assert r.pocock_bound == _POCOCK_C
        assert r.obf_crossed == (abs(z) > obf)
        assert r.pocock_crossed == (abs(z) > _POCOCK_C)
    # OBF boundary is strictly decreasing and ends at c*1
    bounds = [got[k].obf_bound for k, _ in _GS_LOOKS]
    assert bounds == sorted(bounds, reverse=True)
    assert abs(bounds[-1] - _OBF_C) < 1e-9


def _zs_phi(x):
    p, b = 0.2316419, (
        0.319381530,
        -0.356563782,
        1.781477937,
        -1.821255978,
        1.330274429,
    )
    ax = abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((b[4] * t + b[3]) * t + b[2]) * t + b[1]) * t + b[0]) * t
    upper = 1.0 - math.exp(-ax * ax / 2.0) / math.sqrt(2 * math.pi) * poly
    return upper if x >= 0 else 1.0 - upper


def test_thompson_allocation_matches_grid_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext192 import (
        _TH_ARMS,
        _TH_STEPS,
        _TH_VALUE_MIN,
        q_thompson_allocation,
    )

    per_user = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _TH_VALUE_MIN),
                    1,
                ).otherwise(0)
            ).alias("c")
        )
        .collect()
    )
    stats = {a: [0, 0] for a in range(_TH_ARMS)}
    for r in per_user:
        a = r.user_id % _TH_ARMS
        stats[a][0] += 1
        stats[a][1] += r.c
    mu, sd = {}, {}
    for a, (n, c) in stats.items():
        mu[a] = (c + 1.0) / (n + 2.0)
        sd[a] = math.sqrt(mu[a] * (1 - mu[a]) / (n + 3.0))
    lo = min(mu.values()) - 8.0 * max(sd.values())
    hi = max(mu.values()) + 8.0 * max(sd.values())
    dx = (hi - lo) / _TH_STEPS
    p = {a: 0.0 for a in range(_TH_ARMS)}
    for t in range(_TH_STEPS + 1):
        x = lo + t * dx
        w = 0.5 if t in (0, _TH_STEPS) else 1.0
        for a in range(_TH_ARMS):
            z = (x - mu[a]) / sd[a]
            pdf = math.exp(-z * z / 2.0) / (sd[a] * math.sqrt(2 * math.pi))
            prod = 1.0
            for b in range(_TH_ARMS):
                if b != a:
                    prod *= _zs_phi((x - mu[b]) / sd[b])
            p[a] += w * dx * pdf * prod
    got = q_thompson_allocation(spark, sf_dir).collect()
    assert len(got) == _TH_ARMS
    for r in got:
        n, c = stats[r.arm]
        assert (r.n, r.conv) == (n, c)
        assert abs(r.post_mean - round(mu[r.arm], 6)) < 1e-9
        assert abs(r.p_best - round(p[r.arm], 6)) < 2e-6
    # allocation fractions: ~sum to 1, argmax agrees with posterior mean
    total = sum(r.p_best for r in got)
    assert abs(total - 1.0) < 1e-3
    best_by_p = max(got, key=lambda r: r.p_best).arm
    best_by_mu = max(got, key=lambda r: r.post_mean).arm
    assert best_by_p == best_by_mu


def test_ips_estimator_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext192 import (
        _P,
        q_ips_estimator,
    )

    rows = (
        _events(spark, sf_dir)
        .select(
            "event_id",
            F.hour("ts").alias("h"),
            F.round(F.col("value") * 100).cast("long").alias("r_cents"),
        )
        .collect()
    )
    p_of = {0: 0.5, 1: 0.3, 2: 0.2}
    n = len(rows)
    wsum_r = wsum = wsum2 = 0.0
    n_matched = 0
    for r in rows:
        h10 = (r.event_id * 2654435761 % _P) % 10
        a = 0 if h10 < 5 else (1 if h10 < 8 else 2)
        t = 0 if r.h < 12 else (1 if r.h < 18 else 2)
        if a == t:
            w = 1.0 / p_of[a]
            n_matched += 1
            wsum += w
            wsum2 += w * w
            wsum_r += w * (r.r_cents / 100.0)
    [g] = q_ips_estimator(spark, sf_dir).collect()
    assert (g.n, g.n_matched) == (n, n_matched)
    assert abs(g.ips_value - round(wsum_r / n, 6)) < 1e-6
    assert abs(g.snips_value - round(wsum_r / wsum, 6)) < 1e-6
    ess = wsum * wsum / wsum2
    assert abs(g.ess - round(ess, 4)) < 1e-3
    assert abs(g.ess_frac - round(ess / n, 6)) < 1e-6
    assert 0 < g.ess_frac <= 1.0
