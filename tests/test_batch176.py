"""Batch-176 tests: chrF python replay, KMV estimator replay + error
bound, water-filling replay + budget/feasibility invariants."""

from collections import Counter

import numpy as np
from pyspark.sql import functions as F


def test_chrf_matches_python_replay(spark, sf_dir):
    from arrow_supercluster_spark.operators.dedup import normalize_text
    from arrow_supercluster_spark.plans.registry_ext181 import (
        _CHRF_BETA2,
        _CHRF_MAX_N,
        q_chrf,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "source", normalize_text(F.col("text")).alias("t")
        )
        .collect()
    )
    by_src = {}
    for r in rows:
        toks = r.t.split(" ")
        ref = "".join(toks)
        cand = "".join(
            t for i, t in enumerate(toks) if (i + 1) % 7 != 0
        )
        by_src.setdefault(r.source, []).append((ref, cand))

    def grams(s, n):
        return Counter(s[i:i + n] for i in range(len(s) - n + 1))

    for row in q_chrf(spark, sf_dir).collect():
        ps, rs = [], []
        for n in range(1, _CHRF_MAX_N + 1):
            match = ctot = rtot = 0
            for ref, cand in by_src[row.source]:
                cg, rg = grams(cand, n), grams(ref, n)
                match += sum(min(c, rg.get(g, 0)) for g, c in cg.items())
                ctot += sum(cg.values())
                rtot += sum(rg.values())
            ps.append(match / ctot)
            rs.append(match / rtot)
        p, r = np.mean(ps), np.mean(rs)
        f = (
            0.0
            if _CHRF_BETA2 * p + r == 0
            else (1 + _CHRF_BETA2) * p * r / (_CHRF_BETA2 * p + r)
        )
        assert abs(row.chrf_precision - p) < 2e-6
        assert abs(row.chrf_recall - r) < 2e-6
        assert abs(row.chrf2 - f) < 2e-6
        # deletion-only candidate: every cand gram count <= ... recall
        # strictly below precision (the candidate is a subsequence)
        assert row.chrf_recall <= row.chrf_precision + 1e-9


def test_kmv_matches_replay_and_error_bound(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext181 import (
        _KMV_K,
        _KMV_MOD,
        _KMV_MULT,
        q_kmv_distinct,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    ev = (
        read_events(spark, sf_dir)
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    by_t = {}
    for r in ev:
        by_t.setdefault(r.event_type, set()).add(
            ((r.user_id * _KMV_MULT) % _KMV_MOD) / _KMV_MOD
        )
    for row in q_kmv_distinct(spark, sf_dir).collect():
        us = sorted(by_t[row.event_type])
        assert row.n_distinct_true == len(us)
        k = min(_KMV_K, len(us))
        assert row.k_used == k
        assert abs(row.kth_u - us[k - 1]) < 1e-9
        want = (
            float(len(us))
            if len(us) < _KMV_K
            else (_KMV_K - 1) / us[_KMV_K - 1]
        )
        assert abs(row.est_distinct - want) < 1e-3
        if len(us) < _KMV_K:
            assert row.rel_err == 0.0
        else:
            # k=64 KMV has rel std ~1/sqrt(k-2) ~ 12.7%; 5 sigma bound
            assert row.rel_err < 0.65


def test_waterfill_matches_iterative_replay(spark, sf_dir):
    from arrow_supercluster_spark.operators.dedup import normalize_text
    from arrow_supercluster_spark.plans.registry_ext181 import (
        _WF_BUDGET_FRAC,
        q_waterfill_alloc,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", normalize_text(F.col("text")).alias("t"))
        .collect()
    )
    counts = {}
    for r in rows:
        counts[r.source] = counts.get(r.source, 0) + len(r.t.split(" "))
    B = float(np.floor(sum(counts.values()) * _WF_BUDGET_FRAC))

    # independent oracle: bisection on the water level
    def filled(lam):
        return sum(min(c, lam) for c in counts.values())

    lo, hi = 0.0, max(counts.values())
    for _ in range(200):
        mid = (lo + hi) / 2
        if filled(mid) < B:
            lo = mid
        else:
            hi = mid
    lam = (lo + hi) / 2

    got = {r.source: r for r in q_waterfill_alloc(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    total = 0.0
    for s, c in counts.items():
        r = got[s]
        assert r.tokens == c
        assert abs(r.alloc - min(c, lam)) < max(1e-4 * lam, 1e-3)
        assert r.keeps_all == (c <= r.level + 1e-9)
        assert r.alloc <= c + 1e-9
        total += r.alloc
    # allocations exhaust the budget
    assert abs(total - B) < 1e-3 * B
