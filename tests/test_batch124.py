"""Batch-124 tests: Shapley attribution, geometric median,
capture-recapture — python oracles + axioms."""

import math
from collections import defaultdict


def test_shapley_python_oracle_and_efficiency(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext129 import (
        _SH_CHANNELS,
        _SH_N,
        _SH_SCALE,
        _sh_weight,
        q_shapley_attribution,
    )

    got = {
        r.channel: r.shapley
        for r in q_shapley_attribution(spark, sf_dir).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    users = defaultdict(lambda: [0, 0])
    bit = {c: 1 << i for i, c in enumerate(_SH_CHANNELS)}
    for e in ev:
        u = users[e.user_id]
        if e.event_type in bit:
            u[0] |= bit[e.event_type]
        if e.event_type == "purchase":
            u[1] = 1
    vstat = defaultdict(lambda: [0, 0])
    for m, conv in users.values():
        vstat[m][0] += 1
        vstat[m][1] += conv
    v = {m: c / n for m, (n, c) in vstat.items()}
    shap = {}
    for i, ch in enumerate(_SH_CHANNELS):
        total = 0
        for m in range(1 << _SH_N):
            if m & (1 << i):
                continue
            t = (v.get(m | (1 << i), 0.0) - v.get(m, 0.0)) * _sh_weight(
                bin(m).count("1")
            )
            total += round(t * _SH_SCALE)
        shap[ch] = round(total / _SH_SCALE, 6)
    assert got == shap
    # efficiency axiom: Σφ = v(full) − v(∅) (up to the integer grid)
    full = v.get((1 << _SH_N) - 1, 0.0)
    empty = v.get(0, 0.0)
    assert abs(sum(got.values()) - (full - empty)) < 1e-4


def test_geometric_median_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext129 import (
        _GM_CITY,
        _GM_ITERS,
        _GM_SCALE,
        q_geometric_median,
    )
    from arrow_supercluster_spark.sources.points import derived_points

    [r] = q_geometric_median(spark, sf_dir).collect()
    pts = [
        (p.lng, p.lat)
        for p in derived_points(spark, sf_dir).collect()
        if p.city == _GM_CITY and p.lng is not None
    ]
    n = len(pts)
    gx = sum(round(x * _GM_SCALE) for x, _ in pts) / (_GM_SCALE * n)
    gy = sum(round(y * _GM_SCALE) for _, y in pts) / (_GM_SCALE * n)
    cx, cy = gx, gy
    for _ in range(_GM_ITERS):
        nx = ny = dd = 0
        for x, y in pts:
            d = max(math.sqrt((x - gx) ** 2 + (y - gy) ** 2), 1e-9)
            nx += round(x / d * _GM_SCALE)
            ny += round(y / d * _GM_SCALE)
            dd += round(1.0 / d * _GM_SCALE)
        gx, gy = nx / dd, ny / dd
    assert r.n == n
    assert abs(r.med_x - round(gx, 6)) < 1e-9
    assert abs(r.med_y - round(gy, 6)) < 1e-9
    assert abs(r.centroid_x - round(cx, 6)) < 1e-9

    def cost(px, py):
        return (
            sum(
                round(
                    math.sqrt((x - px) ** 2 + (y - py) ** 2) * _GM_SCALE
                )
                for x, y in pts
            )
            / _GM_SCALE
        )

    assert abs(r.cost_centroid - round(cost(cx, cy), 4)) < 1e-9
    assert abs(r.cost_median - round(cost(gx, gy), 4)) < 1e-9
    # Weiszfeld descends: the median's total distance never exceeds
    # the centroid's
    assert r.cost_median <= r.cost_centroid + 1e-9


def test_capture_recapture_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext129 import (
        q_capture_recapture,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_capture_recapture(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    w1 = {e.user_id for e in ev if e.ts.day <= 10}
    w2 = {e.user_id for e in ev if 11 <= e.ts.day <= 20}
    m = len(w1 & w2)
    assert (r.n1, r.n2, r.overlap) == (len(w1), len(w2), m)
    assert abs(
        r.lincoln_petersen - round(len(w1) * len(w2) / m, 4)
    ) < 1e-9
    assert abs(
        r.chapman
        - round((len(w1) + 1) * (len(w2) + 1) / (m + 1) - 1, 4)
    ) < 1e-9
    assert r.n_true == len({e.user_id for e in ev})
    # the estimate should sit near the truth on this well-mixed corpus
    assert 0.5 * r.n_true <= r.lincoln_petersen <= 2.0 * r.n_true
