"""Batch-174 tests: python replays of incremental dedup, split
leakage, and the length-survival sweep."""

import collections
import hashlib
import re


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").collect()


def _dg(text):
    return hashlib.md5(text.strip().lower().encode()).hexdigest()


def test_incremental_dedup_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext179 import (
        q_incremental_dedup,
    )

    got = {
        r.source: (r.n_incoming, r.n_corpus_dups, r.n_batch_dups, r.n_novel)
        for r in q_incremental_dedup(spark, sf_dir).collect()
    }
    docs = _docs(spark, sf_dir)
    by_id = {d.doc_id: d.text for d in docs}

    def text_of(d):
        if d.doc_id % 10 == 9:
            return by_id.get(d.doc_id - 9, d.text)
        if d.doc_id % 10 == 8:
            return by_id.get(d.doc_id - 1, d.text)
        return d.text

    recrawled = [(d.doc_id, d.source, text_of(d)) for d in docs]
    corpus = {_dg(t) for i, _, t in recrawled if i % 10 < 7}
    incoming = [
        type("R", (), {"doc_id": i, "source": src, "text": t})()
        for i, src, t in recrawled if i % 10 >= 7
    ]
    first = {}
    for d in sorted(incoming, key=lambda d: d.doc_id):
        first.setdefault(_dg(d.text), d.doc_id)
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    batch_count = collections.Counter(_dg(d.text) for d in incoming)
    for d in incoming:
        dg = _dg(d.text)
        e = agg[d.source]
        e[0] += 1
        if dg in corpus:
            e[1] += 1
        elif batch_count[dg] > 1 and d.doc_id > first[dg]:
            e[2] += 1
        else:
            e[3] += 1
    assert got == {s: tuple(v) for s, v in agg.items()}
    totals = [sum(v[k] for v in got.values()) for k in range(4)]
    # the synthetic corpus has real duplicates: both dup classes fire
    assert totals[1] > 0 and totals[3] > 0
    assert totals[0] == totals[1] + totals[2] + totals[3]


def test_split_leakage_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext179 import (
        _SL_TEST_MOD,
        q_split_leakage,
    )

    got = {
        r.source: (r.n_test, r.n_leaked, r.leak_rate)
        for r in q_split_leakage(spark, sf_dir).collect()
    }
    docs = _docs(spark, sf_dir)
    by_id = {d.doc_id: d.text for d in docs}

    def text_of(d):
        if d.doc_id % 13 == 12:
            return by_id.get(d.doc_id - 12, d.text)
        return d.text

    is_test = {
        d.doc_id: (d.doc_id * 2654435761 + 40503) % _SL_TEST_MOD == 0
        for d in docs
    }
    train = {_dg(text_of(d)) for d in docs if not is_test[d.doc_id]}
    agg = {d.source: [0, 0] for d in docs}
    for d in docs:
        if is_test[d.doc_id]:
            agg[d.source][0] += 1
            agg[d.source][1] += _dg(text_of(d)) in train
    want = {
        s: (n, lk, round(lk / n, 6) if n else None)
        for s, (n, lk) in agg.items()
    }
    for s in set(got) | set(want):
        assert got.get(s)[:2] == want.get(s)[:2], s
        if want[s][0]:
            assert abs(got[s][2] - want[s][2]) < 1e-9
    # exact duplicates cross the split boundary in the synthetic corpus
    assert sum(v[1] for v in want.values()) > 0


def test_length_sweep_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext179 import (
        _LS_GRID,
        q_length_sweep,
    )

    got = {
        r.min_toks: (r.docs_kept, r.tokens_kept, r.doc_survival,
                     r.token_survival)
        for r in q_length_sweep(spark, sf_dir).collect()
    }
    assert set(got) == set(_LS_GRID)
    docs = _docs(spark, sf_dir)
    toks = [
        len(re.sub(r"\s+", " ", d.text.strip().lower()).split(" "))
        for d in docs
    ]
    all_docs, all_toks = len(toks), sum(toks)
    prev_docs = None
    for g in sorted(_LS_GRID):
        dk = sum(1 for t in toks if t >= g)
        tk = sum(t for t in toks if t >= g)
        assert got[g][0] == dk
        assert got[g][1] == tk
        assert abs(got[g][2] - round(dk / all_docs, 6)) < 1e-9
        assert abs(got[g][3] - round(tk / all_toks, 6)) < 1e-9
        # survival is monotone nonincreasing in the cutoff
        if prev_docs is not None:
            assert dk <= prev_docs
        prev_docs = dk
        # tokens survive better than docs (short docs carry few tokens)
        if 0 < dk < all_docs:
            assert got[g][3] >= got[g][2]
