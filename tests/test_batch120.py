"""Batch-120 tests: streaming CDC ≡ batch (+ split invariance), Neyman
allocation, negative-binomial fit — python oracles."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import defaultdict

from pyspark.sql import functions as F


def test_cdc_stream_equals_batch(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext92 import q_cdc_apply
    from arrow_supercluster_spark.plans.registry_ext125 import q_cdc_stream

    got = q_cdc_stream(spark, sf_dir).collect()
    want = sorted(
        (tuple(r) for r in q_cdc_apply(spark, sf_dir).collect())
    )
    assert sorted(tuple(r) for r in got) == want
    assert len(got) > 0


def test_cdc_fold_is_split_invariant(spark, sf_dir):
    """The same op log folded under a DIFFERENT micro-batch split (8
    hash partitions instead of 4, i.e. different grouping AND order)
    must produce the identical final state — the merge is associative
    and commutative."""
    from arrow_supercluster_spark.streaming import cdc

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ops = cdc.cdc_ops(orders)
    # split A: 3 chunks by seq ranges; split B: interleaved mod-5 chunks
    state_a = None
    for lo, hi in ((0, 1000), (1000, 3000), (3000, 10**9)):
        b = ops.filter((F.col("seq") >= lo) & (F.col("seq") < hi))
        state_a = cdc.fold_cdc_batch(state_a, b)
    state_b = None
    for m in range(5):
        b = ops.filter(F.col("seq") % 5 == m)
        state_b = cdc.fold_cdc_batch(state_b, b)
    fa = sorted(tuple(r) for r in cdc.finish_cdc_state(state_a).collect())
    fb = sorted(tuple(r) for r in cdc.finish_cdc_state(state_b).collect())
    assert fa == fb and fa


def test_neyman_allocation_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext125 import (
        _NEYMAN_BUDGET,
        q_neyman_allocation,
    )

    got = {r.stratum: r for r in q_neyman_allocation(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    strata = defaultdict(list)
    for e in ev:
        strata[e.event_type].append(round(e.value * 100))
    sig = {}
    for s, cs in strata.items():
        n = len(cs)
        sc, ssq = sum(cs), sum(c * c for c in cs)
        sig[s] = (n, math.sqrt((ssq - sc * sc / n) / (10000.0 * (n - 1))))
    t = sum(n * sg for n, sg in sig.values())
    quota = {
        s: (_NEYMAN_BUDGET * n * sg / t, n, sg) for s, (n, sg) in sig.items()
    }
    base = {s: math.floor(q) for s, (q, _, _) in quota.items()}
    leftover = _NEYMAN_BUDGET - sum(base.values())
    order = sorted(
        quota, key=lambda s: (-(quota[s][0] - base[s]), s)
    )
    alloc = dict(base)
    for s in order[:leftover]:
        alloc[s] += 1
    assert sum(alloc.values()) == _NEYMAN_BUDGET
    for s, (q, n, sg) in quota.items():
        r = got[s]
        assert r.n_h == n
        assert abs(r.sigma - round(sg, 4)) < 1e-9
        assert abs(r.share - round(q / _NEYMAN_BUDGET, 6)) < 1e-9
        assert r.n_alloc == alloc[s]
    assert sum(r.n_alloc for r in got.values()) == _NEYMAN_BUDGET


def test_negbin_fit_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext125 import q_negbin_fit
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.event_type: r for r in q_negbin_fit(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    daily = defaultdict(int)
    for e in ev:
        daily[(e.event_type, e.ts.date())] += 1
    per_type = defaultdict(list)
    for (t, _), c in daily.items():
        per_type[t].append(c)
    for t, cs in per_type.items():
        n = len(cs)
        s, ssq = sum(cs), sum(c * c for c in cs)
        m = s / n
        v = (ssq - s * s / n) / (n - 1)
        r = got[t]
        assert r.n_days == n
        assert abs(r.mean_c - round(m, 4)) < 1e-9
        assert abs(r.var_c - round(v, 4)) < 1e-9
        assert r.overdispersed == (v > m)
        if v > m:
            assert abs(r.r - round(m * m / (v - m), 4)) < 1e-9
            assert abs(r.p - round(m / v, 6)) < 1e-9
            assert 0 < r.p < 1
        else:
            assert r.r is None and r.p is None
