"""Batch-117 tests: UCB1 allocation, EB shrinkage, jackknife ratio —
python oracles + method properties."""

import math
from collections import defaultdict


def test_ucb_allocation_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext122 import (
        q_ucb_allocation,
    )

    got = {r.arm: r for r in q_ucb_allocation(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    arms = defaultdict(lambda: [0, 0])
    for e in ev:
        a = arms[e.event_type]
        a[0] += 1
        a[1] += round(e.value * 100)
    big_n = sum(a[0] for a in arms.values())
    scores = {}
    for arm, (n, cents) in arms.items():
        mean = cents / (100.0 * n)
        bonus = math.sqrt(2.0 * math.log(big_n) / n) * 100.0
        scores[arm] = mean + bonus
        r = got[arm]
        assert r.n_pulls == n
        assert abs(r.mean_reward - round(mean, 4)) < 1e-9
        assert abs(r.bonus - round(bonus, 4)) < 1e-9
        assert abs(r.ucb_score - round(mean + bonus, 4)) < 1e-9
    best = max(scores, key=lambda a: scores[a])
    assert sum(1 for r in got.values() if r.play_next) == 1
    assert got[best].play_next


def test_eb_shrinkage_python_oracle_and_pooling(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext122 import (
        _EB_SCALE,
        q_eb_shrinkage,
    )

    got = {r.user_id: r for r in q_eb_shrinkage(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user = defaultdict(lambda: [0, 0])
    for e in ev:
        u = per_user[e.user_id]
        if e.event_type == "click":
            u[0] += 1
        if e.event_type in ("click", "view"):
            u[1] += 1
    per_user = {u: v for u, v in per_user.items() if v[1] > 0}
    k = len(per_user)
    m1s = sum(round(s * 1.0 * _EB_SCALE / n) for s, n in per_user.values())
    m2s = sum(
        round((s * 1.0 / n) * (s * 1.0 / n) * _EB_SCALE)
        for s, n in per_user.values()
    )
    mu = m1s * 1.0 / (k * _EB_SCALE)
    var = m2s * 1.0 / (k * _EB_SCALE) - mu * mu
    alpha = mu * (mu * (1 - mu) / var - 1)
    beta = (1 - mu) * (mu * (1 - mu) / var - 1)
    assert set(got) == set(per_user)
    for u, (s, n) in per_user.items():
        r = got[u]
        assert (r.s, r.n) == (s, n)
        assert abs(r.raw_rate - round(s / n, 6)) < 1e-9
        assert abs(
            r.shrunk_rate - round((s + alpha) / (n + alpha + beta), 6)
        ) < 1e-9
        # partial pooling: shrunk estimate lies between raw rate and prior
        lo, hi = sorted((s / n, mu))
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6
    assert alpha > 0 and beta > 0


def test_jackknife_ratio_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext122 import (
        q_jackknife_ratio,
    )

    [r] = q_jackknife_ratio(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user = defaultdict(lambda: [0, 0])
    for e in ev:
        u = per_user[e.user_id]
        if e.event_type == "purchase":
            u[0] += round(e.value * 100)
        if e.event_type == "view":
            u[1] += 1
    sy = sum(y for y, _ in per_user.values())
    sx = sum(x for _, x in per_user.values())
    reps = [
        (sy - y) * 1.0 / (100.0 * (sx - x)) for y, x in per_user.values()
    ]
    k = len(reps)
    m = sum(round(ri * 1e6) for ri in reps) / (1e6 * k)
    sdd = sum(round((ri - m) * 1e6) ** 2 for ri in reps)
    se = math.sqrt((k - 1.0) / k * (sdd / 1e12))
    assert r.n_units == k
    assert abs(r.ratio - round(sy / (100.0 * sx), 6)) < 1e-9
    assert abs(r.jackknife_se - round(se, 6)) < 1e-9
    assert r.jackknife_se > 0
