"""Batch-98 tests: HMM Viterbi parity, knapsack budget property,
entropy-rate bounds."""

import math
import tempfile

from pyspark.sql import functions as F


def test_hmm_regimes_independent_viterbi(spark, sf_dir):
    """Recompute the decode with an independently-written Viterbi over
    the same daily series and parameters."""
    from arrow_supercluster_spark.plans.registry_ext103 import (
        _STICKY,
        q_hmm_regimes,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {
        r.day: r.regime for r in q_hmm_regimes(spark, sf_dir).collect()
    }
    ev = read_events(spark, sf_dir)
    daily = sorted(
        (r.day, r.n)
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ns = sorted(n for _, n in daily)
    k = len(ns)
    rates = [
        sum(ns[: max(1, k // 3)]) / max(1, k // 3),
        sum(ns[-max(1, k // 3):]) / max(1, k // 3),
    ]
    if rates[0] == rates[1]:
        rates[1] += 1.0

    def lp(n, lam):
        return n * math.log(lam) - lam - math.lgamma(n + 1)

    lt = [[math.log(_STICKY), math.log(1 - _STICKY)],
          [math.log(1 - _STICKY), math.log(_STICKY)]]
    V = [[math.log(0.5) + lp(daily[0][1], rates[s]) for s in (0, 1)]]
    B = []
    for _, n in daily[1:]:
        row, brow = [], []
        for s in (0, 1):
            best = max((V[-1][p] + lt[p][s], p) for p in (0, 1))
            row.append(best[0] + lp(n, rates[s]))
            brow.append(best[1])
        V.append(row)
        B.append(brow)
    s = 0 if V[-1][0] >= V[-1][1] else 1
    path = [s]
    for brow in reversed(B):
        s = brow[s]
        path.append(s)
    path.reverse()
    want = {str(day): st for (day, _), st in zip(daily, path)}
    assert got == want
    assert len(set(got.values())) == 2, "both regimes should appear"


def test_budget_knapsack_properties(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext103 import (
        _BUDGET_CENTS,
        q_budget_knapsack,
    )

    rows = q_budget_knapsack(spark, sf_dir).collect()
    assert rows
    # budget respected; cum_cost consistent with the selected set
    assert max(r.cum_cost for r in rows) <= _BUDGET_CENTS
    assert sum(r.cost_cents for r in rows) == max(r.cum_cost for r in rows)
    # greedy order: the selected set's WORST ratio >= every excluded
    # part's... the cut is on cumulative cost, so just check ratios are
    # internally consistent with cum ordering
    by_cum = sorted(rows, key=lambda r: r.cum_cost)
    ratios = [r.ratio for r in by_cum]
    assert ratios == sorted(ratios, reverse=True)


def test_entropy_rate_bounds(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext103 import (
        q_entropy_rate,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_entropy_rate(spark, sf_dir).collect()
    n_types = (
        read_events(spark, sf_dir).select("event_type").distinct().count()
    )
    assert 0.0 <= r.entropy_rate_nats <= math.log(n_types) + 1e-9
    assert abs(r.entropy_rate_bits - r.entropy_rate_nats / math.log(2)) < 1e-4


def test_entropy_rate_deterministic_chain_is_zero(spark):
    from arrow_supercluster_spark.plans.registry_ext103 import (
        q_entropy_rate,
    )

    rows = []
    for u in range(3):
        for i, t in enumerate(["a", "b", "a", "b", "a"]):
            rows.append((u * 10 + i, u, t, 1.0, f"2024-01-01 00:0{i}:00"))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, value double, t string"
        ).select(
            "event_id", F.to_timestamp("t").alias("ts"), "user_id",
            "event_type", "value", F.lit("{}").alias("props"),
        ).write.parquet(f"{d}/events.parquet")
        [r] = q_entropy_rate(spark, d).collect()
        assert r.entropy_rate_nats == 0.0  # a→b→a→b is deterministic
