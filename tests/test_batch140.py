"""Batch-140 tests: Kendall tau-b, PELT changepoints, Cp/Cpk —
python/scipy oracles + optimality certificates."""

import math
from collections import Counter
from itertools import combinations


def test_kendall_tau_python_and_scipy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext145 import q_kendall_tau
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_kendall_tau(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    xc, yc = Counter(), Counter()
    for e in ev:
        if e.event_type == "click":
            xc[e.ts.day] += 1
        if e.event_type == "purchase":
            yc[e.ts.day] += 1
    days = sorted({e.ts.day for e in ev})
    pts = [(xc.get(d, 0), yc.get(d, 0)) for d in days]
    c = d = tx = ty = 0
    for (x1, y1), (x2, y2) in combinations(pts, 2):
        p = (x2 - x1) * (y2 - y1)
        if p > 0:
            c += 1
        elif p < 0:
            d += 1
        elif x1 == x2 and y1 != y2:
            tx += 1
        elif y1 == y2 and x1 != x2:
            ty += 1
    tau = (c - d) / math.sqrt((c + d + tx) * (c + d + ty))
    assert (r.concordant, r.discordant, r.ties_x, r.ties_y) == (c, d, tx, ty)
    assert abs(r.kendall_tau_b - round(tau, 6)) < 1e-9
    try:
        from scipy.stats import kendalltau
    except ImportError:
        return
    sp, _ = kendalltau([p[0] for p in pts], [p[1] for p in pts])
    assert abs(r.kendall_tau_b - sp) < 1e-6


def test_pelt_optimality_certificate(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext145 import (
        _PELT_BETA_FACTOR,
        optimal_partition,
        q_pelt_changepoints,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = sorted(
        q_pelt_changepoints(spark, sf_dir).collect(),
        key=lambda r: r.segment,
    )
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day for e in ev)
    days = sorted(daily)
    series = [float(daily[d]) for d in days]
    n = len(series)
    mean = sum(series) / n
    var = sum((x - mean) ** 2 for x in series) / (n - 1)
    beta = _PELT_BETA_FACTOR * math.log(n) * var
    cps, cost = optimal_partition(series, beta)
    # structural parity with the returned segments
    bounds = [0] + cps + [n]
    assert len(got) == len(bounds) - 1
    assert got[0].n_changepoints == len(cps)
    for r, (i, j) in zip(got, zip(bounds, bounds[1:])):
        assert (r.start_day, r.end_day) == (days[i], days[j - 1])
        seg = series[i:j]
        m = sum(seg) / len(seg)
        assert abs(r.seg_mean - round(m, 4)) < 1e-9
        assert abs(
            r.seg_sse - round(sum((x - m) ** 2 for x in seg), 4)
        ) < 1e-9
    # OPTIMALITY certificate: brute-force all changepoint subsets for a
    # shortened prefix and confirm the DP's cost is minimal there
    short = series[:12]
    sbeta = _PELT_BETA_FACTOR * math.log(len(short)) * var

    def cost_of(cuts):
        b = [0] + list(cuts) + [len(short)]
        tot = sbeta * len(cuts)
        for i, j in zip(b, b[1:]):
            seg = short[i:j]
            m = sum(seg) / len(seg)
            tot += sum((x - m) ** 2 for x in seg)
        return tot

    _, dp_cost = optimal_partition(short, sbeta)
    best_bf = min(
        cost_of(cuts)
        for k in range(0, 4)
        for cuts in combinations(range(1, len(short)), k)
    )
    assert dp_cost <= best_bf + 1e-9


def test_process_capability_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext145 import (
        _PC_LSL,
        _PC_USL,
        q_process_capability,
    )

    [r] = q_process_capability(spark, sf_dir).collect()
    cents = [
        round(e.value * 100)
        for e in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if e.event_type == "purchase"
    ]
    n = len(cents)
    s, ssq = sum(cents), sum(c * c for c in cents)
    mu = s / (100.0 * n)
    sigma = math.sqrt((ssq - s * s / n) / (10000.0 * (n - 1)))
    cp = (_PC_USL - _PC_LSL) / (6 * sigma)
    cpk = min(_PC_USL - mu, mu - _PC_LSL) / (3 * sigma)
    assert r.n == n
    assert abs(r.mu - round(mu, 4)) < 1e-9
    assert abs(r.sigma - round(sigma, 4)) < 1e-9
    assert abs(r.cp - round(cp, 4)) < 1e-9
    assert abs(r.cpk - round(cpk, 4)) < 1e-9
    assert r.capable == (cpk >= 1.33)
    # Cpk can never exceed Cp
    assert r.cpk <= r.cp + 1e-9
