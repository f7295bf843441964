"""Batch-123 tests: item CF, blocking eval, Bloom FPR — python oracles
+ design properties."""

import json
import math
from collections import Counter, defaultdict


def test_item_cf_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext128 import (
        _CF_ITEMS,
        _CF_RECS,
        _CF_TOPN,
        _CF_USERS,
        q_item_cf_recs,
    )

    got = [
        (r.user_id, r.rec_item, r.score)
        for r in q_item_cf_recs(spark, sf_dir).collect()
    ]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    ui = Counter()
    for e in ev:
        if e.event_type == "click":
            ui[(e.user_id, json.loads(e.props)["k"] % _CF_ITEMS)] += 1
    items_of = defaultdict(dict)
    users_of = defaultdict(dict)
    for (u, i), c in ui.items():
        items_of[u][i] = c
        users_of[i][u] = c
    n2 = {i: sum(c * c for c in users_of[i].values()) for i in users_of}
    sims = defaultdict(dict)
    for i in users_of:
        for j in users_of:
            if i == j:
                continue
            num = sum(
                c * users_of[j][u]
                for u, c in users_of[i].items()
                if u in users_of[j]
            )
            if num:
                sims[i][j] = round(
                    num / (math.sqrt(n2[i]) * math.sqrt(n2[j])) * 1e9
                )
    topn = {
        i: sorted(js.items(), key=lambda kv: (-kv[1], kv[0]))[:_CF_TOPN]
        for i, js in sims.items()
    }
    want = []
    for u in sorted(items_of):
        if u >= _CF_USERS:
            continue
        scores = Counter()
        for i in items_of[u]:
            for j, s in topn.get(i, ()):
                if j not in items_of[u]:
                    scores[j] += s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for j, s in ranked[:_CF_RECS]:
            want.append((u, j, round(s / 1e9, 6)))
    assert sorted(got) == sorted(want)
    assert want  # recommendations actually produced


def test_blocking_eval_python_oracle_and_tradeoff(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext128 import (
        q_blocking_eval,
    )

    got = {r.strategy: r for r in q_blocking_eval(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    n = len(cust)
    strat_a, strat_b = defaultdict(Counter), defaultdict(Counter)
    key_a, key_b = {}, {}
    for c in cust:
        b_seg = "BUILDING" if c.c_custkey % 17 == 0 else c.c_mktsegment
        b_bal = c.c_acctbal + ((c.c_custkey * 7) % 21 - 10)
        ka = {
            "nation": str(c.c_nationkey),
            "segment": c.c_mktsegment,
            "bal_band": str(math.floor(c.c_acctbal / 1000)),
        }
        kb = {
            "nation": str(c.c_nationkey),
            "segment": b_seg,
            "bal_band": str(math.floor(b_bal / 1000)),
        }
        for s in ka:
            strat_a[s][ka[s]] += 1
            strat_b[s][kb[s]] += 1
        key_a[c.c_custkey] = ka
        key_b[c.c_custkey] = kb
    for s in ("nation", "segment", "bal_band"):
        n_cand = sum(
            strat_a[s][k] * strat_b[s][k] for k in strat_a[s] | strat_b[s]
        )
        n_kept = sum(
            1 for cid in key_a if key_a[cid][s] == key_b[cid][s]
        )
        r = got[s]
        assert r.n_candidates == n_cand
        assert r.n_true_kept == n_kept
        assert abs(r.reduction_ratio - round(1 - n_cand / (n * n), 6)) < 1e-9
        assert abs(r.pair_completeness - round(n_kept / n, 6)) < 1e-9
    # design facts: nation never corrupted => recall 1; segment loses the
    # corrupted 17ths; bands lose some jitter-crossed true pairs
    assert got["nation"].pair_completeness == 1.0
    assert got["segment"].pair_completeness < 1.0
    assert got["bal_band"].pair_completeness < 1.0
    # every candidate key must actually block (shrink the pair space)
    assert all(r.reduction_ratio > 0.7 for r in got.values())


def test_bloom_fpr_python_oracle_and_curve(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext128 import (
        _BF_BITS,
        _P,
        q_bloom_fpr_curve,
    )

    got = {r.bits_per_key: r for r in q_bloom_fpr_curve(spark, sf_dir).collect()}
    cust = [
        c.c_custkey
        for c in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    ]
    akeys = [c for c in cust if c % 2 == 0]
    bkeys = [c for c in cust if c % 2 == 1]
    for bits in _BF_BITS:
        k = max(1, round(bits * math.log(2)))
        m = bits * len(akeys)

        def pos(key, j):
            return ((key % _P) * 2654435761 + j * 97003 + 131) % _P % m

        filt = {pos(a, j) for a in akeys for j in range(k)}
        fp = sum(
            1
            for bkey in bkeys
            if all(pos(bkey, j) in filt for j in range(k))
        )
        r = got[bits]
        assert r.k_hashes == k
        assert r.m_bits == m
        assert r.false_positives == fp
        assert r.n_probes == len(bkeys)
        assert abs(r.empirical_fpr - round(fp / len(bkeys), 6)) < 1e-9
        theo = (1 - math.exp(-k * len(akeys) / m)) ** k
        assert abs(r.theoretical_fpr - round(theo, 6)) < 1e-9
        # empirical within a generous band of theory (hash quality)
        assert r.empirical_fpr <= 3 * theo + 0.05
    # more bits per key => fewer false positives (weakly)
    fprs = [got[b].empirical_fpr for b in sorted(_BF_BITS)]
    assert all(x >= y for x, y in zip(fprs, fprs[1:]))
