"""Batch-114 tests: SPRT sequential test, Mahalanobis outliers —
python oracles + decision-theory properties."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import defaultdict


def test_sprt_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext119 import (
        _SPRT_INC_F,
        _SPRT_INC_S,
        _SPRT_LOWER,
        _SPRT_UPPER,
        q_sprt_sequential,
    )

    [r] = q_sprt_sequential(spark, sf_dir).collect()
    ev = sorted(
        (
            e
            for e in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
            if e.event_type == "purchase"
        ),
        key=lambda e: (e.ts, e.event_id),
    )
    llr = 0
    decision, n_at, llr_at = "continue", len(ev), None
    n_success = 0
    for i, e in enumerate(ev, start=1):
        s = 1 if e.value >= 100.0 else 0
        n_success += s
        llr += _SPRT_INC_S if s else _SPRT_INC_F
        if decision == "continue" and (
            llr >= _SPRT_UPPER or llr <= _SPRT_LOWER
        ):
            decision = "accept_h1" if llr >= _SPRT_UPPER else "accept_h0"
            n_at, llr_at = i, llr
    if llr_at is None:
        llr_at = llr
    assert r.n_events == len(ev)
    assert r.n_success == n_success
    assert r.decision == decision
    assert r.n_at_decision == n_at
    assert abs(r.llr_at_decision - round(llr_at / 1e6, 6)) < 1e-9
    # crossing invariants: when a decision is reached the LLR must
    # actually sit beyond the boundary it names, at a valid index
    # (stopping time is the sample path's business — at sf0.001 the
    # empirical rate lies BETWEEN the hypotheses, so the walk drifts
    # slowly and decides late; at sf0.01 it stops in the first ~10%)
    if r.decision != "continue":
        assert 1 <= r.n_at_decision <= r.n_events
        if r.decision == "accept_h1":
            assert r.llr_at_decision >= round(_SPRT_UPPER / 1e6, 6)
        else:
            assert r.llr_at_decision <= round(_SPRT_LOWER / 1e6, 6)


def test_mahalanobis_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext119 import (
        _CHI2_64_99,
        _MAHA_DIMS,
        q_mahalanobis_outliers,
    )

    got = q_mahalanobis_outliers(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    comps = defaultdict(list)
    for e in emb:
        for i, v in enumerate(e.embedding):
            comps[i].append(float(v))
    mu, sd = {}, {}
    for i, vs in comps.items():
        n = len(vs)
        m = sum(vs) / n
        var = sum((x - m) ** 2 for x in vs) / (n - 1)
        mu[i], sd[i] = round(m, 6), round(math.sqrt(var), 6)
    scored = []
    for e in emb:
        acc = 0.0
        for i in range(_MAHA_DIMS):
            t = (float(e.embedding[i]) - mu[i]) / sd[i]
            acc = acc + t * t
        scored.append((e.vec_id, e.label, round(acc, 6), acc > _CHI2_64_99))
    scored.sort(key=lambda s: (-s[2], s[0]))
    want = scored[:20]
    assert len(got) == 20
    for r, (vid, lbl, d2, flag) in zip(got, want):
        assert (r.vec_id, r.label) == (vid, lbl)
        assert abs(r.maha_d2 - d2) < 2e-6  # python naive var vs engine sums
        assert r.is_outlier == flag
    # d² of a standardized 64-dim vector concentrates near 64
    meds = sorted(s[2] for s in scored)
    assert 30 < meds[len(meds) // 2] < 120
