"""Batch-192 tests: newsvendor optimality (critical-fractile theorem
over ALL stock levels), DP accounting replay, transition-entropy
replay."""

import math

from pyspark.sql import functions as F


def _events(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    return read_events(spark, sf_dir)


def test_newsvendor_matches_replay_and_is_optimal(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext197 import (
        _NV_CO,
        _NV_CU,
        q_newsvendor,
    )

    rows = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("demand"))
        .collect()
    )
    demands = sorted(r.demand for r in rows)
    n = len(demands)
    frac = _NV_CU / (_NV_CU + _NV_CO)
    q_star = demands[math.ceil(frac * n) - 1]

    def cost(q):
        return (
            sum(
                _NV_CU * max(d - q, 0) + _NV_CO * max(q - d, 0)
                for d in demands
            )
            / n
        )

    q_mean = round(sum(demands) / n)
    [r] = q_newsvendor(spark, sf_dir).collect()
    assert (r.n_days, r.q_star, r.q_mean) == (n, q_star, q_mean)
    assert abs(r.cost_at_qstar - round(cost(q_star), 6)) < 1e-9
    assert abs(r.cost_at_mean - round(cost(q_mean), 6)) < 1e-9
    assert r.qstar_no_worse
    # critical-fractile optimality: q* minimizes cost over every
    # integer stock level in the demand range
    best = min(cost(q) for q in range(min(demands), max(demands) + 1))
    assert abs(cost(q_star) - best) < 1e-12


def test_dp_laplace_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext197 import (
        _DP_CLIP,
        _DP_EPS,
        q_dp_laplace,
    )

    rows = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("value")
        .collect()
    )
    n = len(rows)
    sum_clip = (
        sum(min(round(r.value * 100), int(_DP_CLIP * 100)) for r in rows)
        / 100.0
    )
    got = q_dp_laplace(spark, sf_dir).collect()
    assert len(got) == 2 * len(_DP_EPS)
    for r in got:
        delta, truth = (
            (1.0, float(n))
            if r.query == "count_purchases"
            else (_DP_CLIP, sum_clip)
        )
        b = delta / r.eps
        assert abs(r.true_value - round(truth, 2)) < 1e-9
        assert abs(r.laplace_b - round(b, 6)) < 1e-9
        assert r.expected_abs_error == r.laplace_b
        assert abs(r.rel_error - round(b / truth, 6)) < 1e-9
        assert r.utility_ok == (b / truth < 0.01)
    # privacy-utility monotonicity: error decreases as eps grows
    for q in ("count_purchases", "sum_value_clipped"):
        errs = [r.rel_error for r in got if r.query == q]
        assert errs == sorted(errs, reverse=True)


def test_transition_entropy_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext197 import (
        q_transition_entropy,
    )

    rows = (
        _events(spark, sf_dir)
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type)
        )
    cells = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            cells[(a, b)] = cells.get((a, b), 0) + 1
    states = sorted({a for a, _ in cells})
    t = {a: sum(n for (aa, _), n in cells.items() if aa == a)
         for a in states}
    h = {}
    for a in states:
        ps = [n / t[a] for (aa, _), n in cells.items() if aa == a]
        h[a] = -sum(p * math.log(p) for p in ps)
    grand = sum(t.values())
    rate = sum(t[a] / grand * h[a] for a in states)
    got = q_transition_entropy(spark, sf_dir).collect()
    assert [r.state for r in got] == states
    for r in got:
        k = sum(1 for (aa, _) in cells if aa == r.state)
        assert (r.n_trans, r.k_next) == (t[r.state], k)
        assert abs(r.entropy - round(h[r.state], 6)) < 1e-6
        if k > 1:
            assert abs(
                r.norm_entropy - round(h[r.state] / math.log(k), 6)
            ) < 1e-6
            assert 0 <= r.norm_entropy <= 1 + 1e-9
        assert abs(r.entropy_rate - round(rate, 6)) < 1e-6
