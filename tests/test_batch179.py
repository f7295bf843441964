"""Batch-179 tests: JSD/Hellinger/TVD scipy+numpy replays and metric
inequalities; apriori replay with lift sanity."""

from collections import Counter

import numpy as np
from pyspark.sql import functions as F


def _dists(spark, sf_dir):
    from arrow_supercluster_spark.operators.dedup import normalize_text

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", normalize_text(F.col("text")).alias("t"))
        .collect()
    )
    per_src, corpus = {}, Counter()
    for r in rows:
        c = Counter(r.t.split(" "))
        per_src.setdefault(r.source, Counter()).update(c)
        corpus.update(c)
    return per_src, corpus


def test_js_divergence_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext184 import (
        q_js_divergence,
    )

    per_src, corpus = _dists(spark, sf_dir)
    ct = sum(corpus.values())
    for r in q_js_divergence(spark, sf_dir).collect():
        src = per_src[r.source]
        st = sum(src.values())
        jsd = 0.0
        for tok, cc in corpus.items():
            p = src.get(tok, 0) / st
            q = cc / ct
            m = 0.5 * p + 0.5 * q
            if p > 0:
                jsd += 0.5 * p * np.log(p / m)
            jsd += 0.5 * q * np.log(q / m)
        assert abs(r.jsd - jsd) < 2e-6
        assert 0 <= r.jsd <= np.log(2) + 1e-9
        assert r.within_bound


def test_hellinger_tvd_match_replay_and_inequalities(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext184 import (
        q_hellinger_tvd,
        q_js_divergence,
    )

    per_src, corpus = _dists(spark, sf_dir)
    ct = sum(corpus.values())
    jsd_rows = {
        r.source: r.jsd for r in q_js_divergence(spark, sf_dir).collect()
    }
    for r in q_hellinger_tvd(spark, sf_dir).collect():
        src = per_src[r.source]
        st = sum(src.values())
        bc = tvd = 0.0
        for tok, cc in corpus.items():
            p = src.get(tok, 0) / st
            q = cc / ct
            bc += np.sqrt(p * q)
            tvd += abs(p - q)
        tvd *= 0.5
        h = np.sqrt(max(1 - bc, 0.0))
        assert abs(r.hellinger - h) < 2e-6
        assert abs(r.tvd - tvd) < 2e-6
        assert r.h2_le_tvd
        # Hellinger^2 <= TVD <= sqrt(2)*Hellinger (the standard bounds)
        assert r.tvd <= np.sqrt(2) * r.hellinger + 1e-6
        # both bounded by 1, and 0 only if identical
        assert 0 <= r.hellinger <= 1 and 0 <= r.tvd <= 1
        assert (r.tvd == 0) == (jsd_rows[r.source] == 0)


def test_frequent_itemsets_match_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext184 import (
        _FI_MIN_SUPPORT,
        q_frequent_itemsets,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    baskets = {}
    for r in rows:
        baskets.setdefault(r.user_id, set()).add(r.event_type)
    n = len(baskets)
    single = Counter()
    pair = Counter()
    for types in baskets.values():
        for t in types:
            single[t] += 1
        for a in types:
            for b in types:
                if a != b:
                    pair[(a, b)] += 1
    got = {
        (r.ante, r.cons): r
        for r in q_frequent_itemsets(spark, sf_dir).collect()
    }
    want_keys = {
        k for k, c in pair.items() if c / n >= _FI_MIN_SUPPORT
    }
    assert set(got) == want_keys
    for (a, b), r in got.items():
        c = pair[(a, b)]
        assert r.pair_users == c
        assert abs(r.support - c / n) < 2e-6
        assert abs(r.confidence - c / single[a]) < 2e-6
        assert abs(r.lift - c * n / (single[a] * single[b])) < 2e-6
        # symmetric support, symmetric lift
        assert got[(b, a)].pair_users == c
        assert abs(got[(b, a)].lift - r.lift) < 2e-6
