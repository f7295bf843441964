"""Batch-160 tests: streaming HLL registers == batch registers,
histogram-quantile bound + python replay, replay idempotence
(including a NEGATIVE control showing what append-mode would do)."""

import numpy as np


def test_hll_stream_equals_batch_registers(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext165 import (
        hll_estimate,
        hll_user_registers,
        q_hll_stream,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    r = q_hll_stream(spark, sf_dir).collect()[0]
    ev = read_events(spark, sf_dir)
    batch_regs = {
        (x.bucket, x.rho) for x in hll_user_registers(ev).collect()
    }
    est = hll_estimate(hll_user_registers(ev)).collect()[0].estimate
    # MAX-merge means the streamed registers equal the batch build's
    assert abs(r.hll_estimate - est) < 1e-3
    exact = ev.select("user_id").distinct().count()
    assert r.exact_distinct == exact
    assert r.rel_error < 0.5  # m=64 => sigma ~ 13%; generous 3.5+ sigma
    # python replay of the register build
    users = {u.user_id for u in ev.select("user_id").distinct().collect()}
    regs = {}
    for u in users:
        hv = (u * 2654435761 + 12345) % 2147483647
        b, w = hv % 64, hv // 64
        rho = 26 if w == 0 else 25 - int(np.floor(np.log2(w)))
        regs[b] = max(regs.get(b, 0), rho)
    assert batch_regs == set(regs.items())


def test_hist_quantiles_bound_and_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext165 import (
        _HQ_BINS,
        _HQ_HI,
        _HQ_LO,
        q_hist_quantiles,
    )

    rows = {r.q: r for r in q_hist_quantiles(spark, sf_dir).collect()}
    assert set(rows) == {0.5, 0.9, 0.99}
    vals = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter("event_type = 'purchase'")
        .selectExpr(
            "CAST(CAST(round(value*100) AS LONG) / 100.0 AS DOUBLE) AS x"
        )
        .collect()
    )
    x = np.sort(np.array([v.x for v in vals]))
    width = (_HQ_HI - _HQ_LO) / _HQ_BINS
    bins = np.minimum(
        np.floor((x - _HQ_LO) / width).astype(int), _HQ_BINS - 1
    )
    for q, r in rows.items():
        # replay: first bin whose cumulative count crosses q*N
        cum = 0
        for b in sorted(set(bins)):
            cum += (bins == b).sum()
            if cum >= q * len(x):
                break
        want = _HQ_LO + (b + 0.5) * width
        assert abs(r.hist_quantile - want) < 1e-6
        # exact = TYPE-1 (inverse-CDF) quantile: min x with cum >= q*N
        # (r6 ADVICE: for type-1 the half-bin bound is a theorem — the
        # crossing bin CONTAINS the type-1 quantile)
        idx = int(np.searchsorted(np.cumsum(np.ones_like(x)),
                                  q * len(x), side="left"))
        type1 = x[min(idx, len(x) - 1)]
        assert abs(r.exact_quantile - round(type1, 4)) < 1e-6
        assert r.within_bin_bound
        assert (
            abs(r.hist_quantile - r.exact_quantile)
            <= width * 0.5 + 1e-6
        )


def test_replay_idempotence_and_append_negative_control(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext165 import (
        q_replay_idempotence,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_replay_idempotence(spark, sf_dir).collect()[0]
    assert r.replay_consistent
    ev = read_events(spark, sf_dir)
    assert r.n_events == ev.count()
    cents = ev.agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("c")
    ).collect()[0].c
    assert r.revenue_cents == cents
    # negative control: APPEND-mode replay double-counts — the failure
    # the overwrite-own-path discipline exists to prevent
    import tempfile

    sink = tempfile.mkdtemp(prefix="replay_neg_")
    day = F.dayofmonth("ts")
    part = ev.filter((day >= 11) & (day <= 20)).groupBy(
        day.alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    part.write.mode("overwrite").parquet(f"{sink}/batch_id=1")
    part.write.mode("append").parquet(f"{sink}/batch_id=1")  # bad replay
    doubled = (
        spark.read.parquet(f"{sink}/batch_id=*")
        .agg(F.sum("n").alias("n"))
        .collect()[0]
        .n
    )
    single = part.agg(F.sum("n").alias("n")).collect()[0].n
    assert doubled == 2 * single
