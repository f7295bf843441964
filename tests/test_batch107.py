"""Batch-107 tests: PMI collocations and TextRank keywords — python
oracles (full PMI table; full 3-iteration pagerank)."""

import math
from collections import Counter, defaultdict


def _toks(text):
    return [t for t in " ".join(text.strip().lower().split()).split(" ") if t]


def test_collocations_pmi_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext112 import (
        _PMI_K,
        _PMI_MIN,
        q_collocations_pmi,
    )

    got = [(r.w1, r.w2, r.c2, r.pmi)
           for r in q_collocations_pmi(spark, sf_dir).collect()]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt2, uni = Counter(), Counter()
    for d in docs:
        ts = _toks(d.text)
        uni.update(ts)
        for a, b in zip(ts, ts[1:]):
            cnt2[(a, b)] += 1
    n_tok, n_big = sum(uni.values()), sum(cnt2.values())
    table = [
        (
            a, b, c,
            round(
                math.log(
                    (c / n_big) / ((uni[a] / n_tok) * (uni[b] / n_tok))
                ),
                6,
            ),
        )
        for (a, b), c in cnt2.items()
        if c >= _PMI_MIN
    ]
    want = sorted(table, key=lambda t: (-t[3], t[0], t[1]))[:_PMI_K]
    assert len(got) == _PMI_K
    assert sorted(got, key=lambda t: (-t[3], t[0], t[1])) == want


def test_textrank_keywords_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext112 import (
        _TR_K,
        q_textrank_keywords,
    )

    got = [(r.word, r.rank)
           for r in q_textrank_keywords(spark, sf_dir).collect()]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    edges = set()
    for d in docs:
        ts = _toks(d.text)
        for a, b in zip(ts, ts[1:]):
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    n = len(nodes)
    out = defaultdict(list)
    deg = Counter()
    for a, b in edges:
        out[a].append(b)
        deg[a] += 1
    rank = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(3):
        inflow = defaultdict(float)
        for a, bs in out.items():
            for b in bs:
                inflow[b] += rank[a] / deg[a]
        rank = {
            v: round(0.15 / n + 0.85 * inflow.get(v, 0.0), 9) for v in nodes
        }
    table = sorted(
        ((w, round(r, 6)) for w, r in rank.items()),
        key=lambda t: (-t[1], t[0]),
    )[:_TR_K]
    assert len(got) == _TR_K
    assert sorted(got, key=lambda t: (-t[1], t[0])) == table
