"""Batch-138 tests: transport plan, records test, turning points —
python oracles + the W1-identity cross-check."""

import math
from collections import Counter


def test_transport_plan_python_oracle_and_w1_identity(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext143 import (
        q_transport_plan,
    )

    got = [
        (r.from_value, r.to_value, r.mass_units, r.cost_contrib)
        for r in q_transport_plan(spark, sf_dir).collect()
    ]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    a = Counter(
        round(e.value * 100) for e in ev if e.event_type == "click"
    )
    b = Counter(
        round(e.value * 100) for e in ev if e.event_type == "purchase"
    )
    na, nb = sum(a.values()), sum(b.values())

    def intervals(cnt, mult):
        out = []
        cum = 0
        for v in sorted(cnt):
            out.append((v, cum * mult, (cum + cnt[v]) * mult))
            cum += cnt[v]
        return out

    ia = intervals(a, nb)
    ib = intervals(b, na)
    flows = []
    total_cost = 0
    for av, alo, ahi in ia:
        for bv, blo, bhi in ib:
            m = min(ahi, bhi) - max(alo, blo)
            if m > 0:
                flows.append(
                    (
                        round(av / 100.0, 2),
                        round(bv / 100.0, 2),
                        m,
                        round(abs(av - bv) * m / (100.0 * na * nb), 6),
                    )
                )
                total_cost += abs(av - bv) * m
    flows.sort(key=lambda f: (-f[2], f[0], f[1]))
    assert got == flows[:15]
    # the plan's total cost IS W1 (checked against the registered W1)
    from arrow_supercluster_spark.plans.registry import REGISTRY

    [w1row] = REGISTRY["q_wasserstein_1d"].spark(spark, sf_dir).collect()
    w1_from_plan = total_cost / (100.0 * na * nb)
    assert abs(w1row.w1_distance - round(w1_from_plan, 6)) < 2e-6
    # the coupling is a valid transport plan: flow masses partition n_a*n_b
    assert sum(m for _, _, m, _ in flows) == na * nb


def test_record_days_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext143 import q_record_days
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_record_days(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day for e in ev)
    days = sorted(daily)
    best = -1
    n_rec = 0
    for d in days:
        if daily[d] > best:
            n_rec += 1
            best = daily[d]
    n = len(days)
    h = sum(1.0 / i for i in range(1, n + 1))
    assert r.n_days == n
    assert r.n_records == n_rec
    assert abs(r.expected_records - round(h, 4)) < 1e-9
    assert abs(
        r.z_approx - round((n_rec - h) / math.sqrt(h - 1.6449), 4)
    ) < 1e-9
    # the first day is always a record
    assert r.n_records >= 1


def test_turning_points_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext143 import (
        q_turning_points,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_turning_points(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day for e in ev)
    days = sorted(daily)
    turns = 0
    for i in range(1, len(days) - 1):
        l, m, rr = daily[days[i - 1]], daily[days[i]], daily[days[i + 1]]
        if days[i - 1] == days[i] - 1 and days[i + 1] == days[i] + 1:
            if (m > l and m > rr) or (m < l and m < rr):
                turns += 1
    n = len(days)
    exp = 2.0 * (n - 2) / 3.0
    sd = math.sqrt((16.0 * n - 29.0) / 90.0)
    assert r.n_days == n
    assert r.turning_points == turns
    assert abs(r.expected - round(exp, 4)) < 1e-9
    assert abs(r.z - round((turns - exp) / sd, 4)) < 1e-9
    assert 0 <= r.turning_points <= n - 2
