"""Batch-102 tests: Hamming-banded SimHash join (pigeonhole recall) and
Rocchio PRF — independent python oracles."""

import math
from collections import Counter

from pyspark.sql import functions as F


def _toks(text):
    return " ".join(text.strip().lower().split()).split(" ")


def test_simhash_hamming_join_equals_allpairs_oracle(spark, sf_dir):
    """Pigeonhole completeness: with 4 bands and r=3, every pair within
    Hamming distance 3 shares at least one intact nibble, so the banded
    join must return EXACTLY the all-pairs hamming<=3 set (recall 1.0,
    and the popcount verify kills every false band candidate)."""
    from arrow_supercluster_spark.plans.registry_ext43 import (
        q_simhash_portable,
    )
    from arrow_supercluster_spark.plans.registry_ext107 import (
        _HAM_R,
        q_simhash_hamming_join,
    )

    fp = {r.doc_id: r.simhash
          for r in q_simhash_portable(spark, sf_dir).collect()}
    got = {(r.a_id, r.b_id): r.hamming
           for r in q_simhash_hamming_join(spark, sf_dir).collect()}
    ids = sorted(fp)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fp[a] ^ fp[b]).count("1")
            if h <= _HAM_R:
                want[(a, b)] = h
    assert got == want
    assert len(want) > 0  # the corpus actually contains near-dup fingerprints


def _bm25_py(docs_toks, terms, k1, b):
    n_docs = len(docs_toks)
    avgdl = sum(len(t) for t in docs_toks.values()) / n_docs
    tf = {d: Counter(t for t in toks if t in terms)
          for d, toks in docs_toks.items()}
    df = Counter()
    for d, c in tf.items():
        for t in c:
            df[t] += 1
    scores = {}
    for d, c in tf.items():
        if not c:
            continue
        dl = len(docs_toks[d])
        s = sum(
            math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            * c[t] * (k1 + 1) / (c[t] + k1 * (1 - b + b * dl / avgdl))
            for t in c
        )
        scores[d] = (round(s, 6), len(c))
    return scores


def test_rocchio_prf_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.operators.relevance import B, K1
    from arrow_supercluster_spark.plans.registry_ext107 import (
        _PRF_EXPAND,
        _PRF_FB,
        _PRF_K,
        _PRF_STOP,
        _PRF_TERMS,
        q_rocchio_prf,
    )

    got = [(r.doc_id, r.score, r.n_hits)
           for r in q_rocchio_prf(spark, sf_dir).collect()]
    docs_toks = {
        d.doc_id: _toks(d.text)
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    seed = set(_PRF_TERMS)
    s1 = _bm25_py(docs_toks, seed, K1, B)
    fb = [d for d, _ in sorted(s1.items(), key=lambda kv: (-kv[1][0], kv[0]))][
        :_PRF_FB
    ]
    dfc = Counter()
    for d in fb:
        for t in set(docs_toks[d]):
            if t not in seed and t not in _PRF_STOP:
                dfc[t] += 1
    expansion = [t for t, _ in sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))][
        :_PRF_EXPAND
    ]
    s2 = _bm25_py(docs_toks, seed | set(expansion), K1, B)
    want = sorted(
        ((d, v[0], v[1]) for d, v in s2.items()),
        key=lambda t: (-t[1], t[0]),
    )[:_PRF_K]
    assert len(got) == _PRF_K
    got_sorted = sorted(got, key=lambda t: (-t[1], t[0]))
    for (gd, gs, gh), (wd, ws, wh) in zip(got_sorted, want):
        assert gd == wd and gh == wh
        assert abs(gs - ws) < 1e-4
    # the expansion actually changed the result set vs the seed query
    seed_top = [d for d, _ in sorted(s1.items(), key=lambda kv: (-kv[1][0], kv[0]))][
        :_PRF_K
    ]
    assert {d for d, _, _ in got} != set(seed_top) or expansion
