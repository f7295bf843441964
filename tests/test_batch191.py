"""Batch-191 tests: LM-scoring replay, best-passage brute force,
MinDist proximity brute force."""

import math
import re

from pyspark.sql import functions as F


def _doc_toks(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext import _docs

    rows = _docs(spark, sf_dir).select("doc_id", "text").collect()
    out = {}
    for r in rows:
        norm = re.sub(r"\s+", " ", r.text.strip().lower())
        toks = norm.split(" ") if norm else []
        if toks:
            out[r.doc_id] = toks
    return out


def test_query_likelihood_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext196 import (
        _QL_LAMBDA,
        _QL_MU,
        _QL_TERMS,
        _QL_TOPK,
        q_query_likelihood,
    )

    docs = _doc_toks(spark, sf_dir)
    total = sum(len(t) for t in docs.values())
    cf = {t: sum(toks.count(t) for toks in docs.values()) for t in _QL_TERMS}
    scored = []
    for did, toks in docs.items():
        dl = len(toks)
        dirichlet = sum(
            math.log(
                (toks.count(t) + _QL_MU * cf[t] / total) / (dl + _QL_MU)
            )
            for t in _QL_TERMS
        )
        jm = sum(
            math.log(
                (1 - _QL_LAMBDA) * toks.count(t) / dl
                + _QL_LAMBDA * cf[t] / total
            )
            for t in _QL_TERMS
        )
        scored.append((did, dl, dirichlet, jm))
    scored.sort(key=lambda r: (-r[2], r[0]))
    want = scored[:_QL_TOPK]
    got = q_query_likelihood(spark, sf_dir).collect()
    assert len(got) == len(want)
    for g, (did, dl, d, j) in zip(got, want):
        assert (g.doc_id, g.dl) == (did, dl)
        assert abs(g.dirichlet_score - round(d, 6)) < 1e-9
        assert abs(g.jm_score - round(j, 6)) < 1e-9
    # more query-term mass => higher Dirichlet score: the top doc has at
    # least as many total hits as the last returned doc
    top_hits = sum(docs[want[0][0]].count(t) for t in _QL_TERMS)
    last_hits = sum(docs[want[-1][0]].count(t) for t in _QL_TERMS)
    assert top_hits >= 1 and top_hits >= last_hits - 2


def _hits(docs, terms):
    out = {}
    for did, toks in docs.items():
        ps = [
            (i + 1, t) for i, t in enumerate(toks) if t in terms
        ]
        if ps:
            out[did] = ps
    return out


def test_best_passage_matches_brute_force(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext196 import (
        _BP_TOPK,
        _BP_WIDTH,
        _QL_TERMS,
        q_best_passage,
    )

    docs = _doc_toks(spark, sf_dir)
    hits = _hits(docs, set(_QL_TERMS))
    rows = []
    for did, ps in hits.items():
        pos = [p for p, _ in ps]
        best_cnt, best_start = -1, None
        for s in pos:  # optimum window is hit-anchored
            cnt = sum(1 for p in pos if s <= p < s + _BP_WIDTH)
            if cnt > best_cnt or (cnt == best_cnt and s < best_start):
                best_cnt, best_start = cnt, s
        rows.append((did, best_start, best_cnt, len(pos)))
    rows.sort(key=lambda r: (-r[2], r[0]))
    want = rows[:_BP_TOPK]
    got = q_best_passage(spark, sf_dir).collect()
    assert [(r.doc_id, r.win_start, r.win_hits, r.n_hits) for r in got] == want
    # every reported window is non-degenerate
    assert all(r.win_hits >= 1 for r in got)


def test_term_proximity_matches_brute_force(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext196 import (
        _QL_TERMS,
        _TP_TOPK,
        q_term_proximity,
    )

    docs = _doc_toks(spark, sf_dir)
    hits = _hits(docs, set(_QL_TERMS))
    rows = []
    for did, ps in hits.items():
        best = None
        for i, (p1, t1) in enumerate(ps):
            for p2, t2 in ps:
                if t1 < t2:
                    d = abs(p1 - p2)
                    best = d if best is None else min(best, d)
        if best is not None:
            rows.append((did, best))
    rows.sort(key=lambda r: (r[1], r[0]))
    want = rows[:_TP_TOPK]
    got = q_term_proximity(spark, sf_dir).collect()
    assert [(r.doc_id, r.min_dist) for r in got] == want
    assert all(r.min_dist >= 1 for r in got)
