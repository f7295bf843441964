"""Batch-190 tests: pass@k combinatorial replay (exact C(n-c,k)/C(n,k)),
Bradley-Terry MM replay + ordering invariant, item-analysis replay."""

import math

from pyspark.sql import functions as F


def _events(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    return read_events(spark, sf_dir)


def test_pass_at_k_matches_exact_combinatorics(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext195 import (
        _PK_CORRECT_MIN,
        _PK_KS,
        q_pass_at_k,
    )

    rows = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
        .collect()
    )
    probs = {}
    for r in rows:
        n, c = probs.get(r.user_id, (0, 0))
        probs[r.user_id] = (n + 1, c + (1 if r.value > _PK_CORRECT_MIN else 0))
    got = {r.k: r for r in q_pass_at_k(spark, sf_dir).collect()}
    assert sorted(got) == list(_PK_KS)
    for k in _PK_KS:
        vals = [
            1.0 - math.comb(n - c, k) / math.comb(n, k)
            for n, c in probs.values()
            if n >= k
        ]
        r = got[k]
        assert r.n_problems == len(vals) > 0
        assert abs(r.pass_at_k - round(sum(vals) / len(vals), 6)) < 1e-6
    # pass@k is non-decreasing in k on any fixed problem set... only when
    # the problem sets coincide; check on the common n>=10 subset instead
    common = [(n, c) for n, c in probs.values() if n >= max(_PK_KS)]
    rates = [
        sum(1.0 - math.comb(n - c, k) / math.comb(n, k) for n, c in common)
        / len(common)
        for k in _PK_KS
    ]
    assert rates == sorted(rates)


def test_bradley_terry_matches_mm_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext195 import (
        _BT_ITERS,
        q_bradley_terry,
    )

    rows = (
        _events(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    daily = {}
    for r in rows:
        daily.setdefault(r.d, {})[r.event_type] = r.n
    duels = {}  # (i, j) -> [n_ij, w_ij]
    for d, counts in daily.items():
        types = sorted(counts)
        for i in types:
            for j in types:
                if i != j and counts[i] != counts[j]:
                    rec = duels.setdefault((i, j), [0, 0])
                    rec[0] += 1
                    if counts[i] > counts[j]:
                        rec[1] += 1
    types = sorted({i for i, _ in duels})
    W = {t: sum(w for (i, _), (_, w) in duels.items() if i == t)
         for t in types}
    n_comp = {t: sum(n for (i, _), (n, _) in duels.items() if i == t)
              for t in types}
    w = {t: 1.0 for t in types}
    for _ in range(_BT_ITERS):
        raw = {}
        for t in types:
            denom = sum(
                duels[(t, j)][0] / (w[t] + w[j])
                for j in types
                if (t, j) in duels
            )
            raw[t] = W[t] / denom
        s = sum(raw.values())
        w = {t: raw[t] * len(types) / s for t in types}
    got = q_bradley_terry(spark, sf_dir).collect()
    assert [r.event_type for r in got] == types
    for r in got:
        assert (r.comparisons, r.wins) == (n_comp[r.event_type], W[r.event_type])
        assert abs(r.strength - round(w[r.event_type], 6)) < 1e-6
    # MM preserves the win-rate ordering on a dense duel graph
    by_strength = sorted(types, key=lambda t: -w[t])
    by_winrate = sorted(types, key=lambda t: -W[t] / n_comp[t])
    assert by_strength == by_winrate
    # mean-1 normalization
    assert abs(sum(r.strength for r in got) / len(got) - 1.0) < 1e-5


def test_item_analysis_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext195 import (
        _IA_SOLVE_MIN,
        q_item_analysis,
    )

    rows = (
        _events(spark, sf_dir)
        .select("user_id", "event_type", "value")
        .collect()
    )
    solved = {}
    for r in rows:
        key = (r.user_id, r.event_type)
        solved[key] = max(
            solved.get(key, 0), 1 if r.value > _IA_SOLVE_MIN else 0
        )
    users = sorted({u for u, _ in solved})
    score = {u: sum(x for (uu, _), x in solved.items() if uu == u)
             for u in users}
    n = len(users)
    mean_s = sum(score.values()) / n
    sd = math.sqrt(sum(s * s for s in score.values()) / n - mean_s**2)
    got = q_item_analysis(spark, sf_dir).collect()
    for r in got:
        xs = {u: solved.get((u, r.event_type), None) for u in users}
        xs = {u: x for u, x in xs.items() if x is not None}
        n_users = len(xs)
        n1 = sum(xs.values())
        p = n1 / n_users
        assert r.n_users == n_users
        assert abs(r.difficulty - round(p, 6)) < 1e-9
        if 0 < n1 < n_users:
            m1 = sum(score[u] for u, x in xs.items() if x == 1) / n1
            m0 = sum(score[u] for u, x in xs.items() if x == 0) / (
                n_users - n1
            )
            rpb = (m1 - m0) / sd * math.sqrt(p * (1 - p))
            assert abs(r.point_biserial - round(rpb, 6)) < 1e-9
