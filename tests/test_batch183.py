"""Batch-183 tests: negative-sampling replay + exclusion property,
hard-negative replay with group-exclusion, curriculum order
monotonicity + conservation."""

import numpy as np
from pyspark.sql import functions as F


def test_negative_sampling_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext188 import (
        _NS_ANCHOR_MOD,
        _NS_K,
        _NS_MULT,
        q_negative_sampling,
    )

    docs = {
        r.doc_id: r.source
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    n = len(docs)
    want = set()
    for a, src in docs.items():
        if a % _NS_ANCHOR_MOD != 0:
            continue
        for j in range(1, _NS_K + 1):
            neg = (a * _NS_MULT + j * 97) % n
            if neg != a and docs[neg] != src:
                want.add((a, j, neg, docs[neg]))
    got = {
        (r.anchor_id, r.draw, r.neg_id, r.neg_source)
        for r in q_negative_sampling(spark, sf_dir).collect()
    }
    assert got == want
    # the exclusion rule held everywhere
    assert all(docs[a] != s for a, _, _, s in got)
    assert len(got) > 0


def test_hard_negatives_matches_bruteforce(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext188 import (
        _HN_K,
        q_hard_negatives,
    )

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(
            f"{sf_dir}/embeddings.parquet"
        ).collect()
    }
    want = {}
    for qid in range(10):
        qv = emb[qid]
        scored = []
        for vid, cv in emb.items():
            if vid < 10 or vid % 10 == qid:
                continue
            cos = round(
                float(qv @ cv)
                / (np.linalg.norm(qv) * np.linalg.norm(cv)),
                6,
            )
            scored.append((-cos, vid))
        scored.sort()
        want[qid] = [
            (vid, -negcos) for negcos, vid in scored[:_HN_K]
        ]
    got = {}
    for r in q_hard_negatives(spark, sf_dir).collect():
        got.setdefault(r.q_id, []).append(
            (r.hard_neg_id, r.cos, r.rank)
        )
    for qid, rows in got.items():
        rows = sorted(rows, key=lambda x: x[2])
        assert [(v, c) for v, c, _ in rows] == want[qid]
        # no hard negative from the query's own group
        assert all(v % 10 != qid for v, _, _ in rows)


def test_curriculum_order_monotone_and_conserving(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext188 import (
        q_curriculum_order,
    )

    rows = sorted(
        q_curriculum_order(spark, sf_dir).collect(),
        key=lambda r: r.phase,
    )
    # phases are 1..K, difficulty non-decreasing along the schedule
    assert [r.phase for r in rows] == list(range(1, len(rows) + 1))
    diffs = [r.difficulty for r in rows]
    assert diffs == sorted(diffs)
    # cumulative token share is monotone and ends at 1
    shares = [r.cum_token_share for r in rows]
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-6
    # doc conservation: every doc is in exactly one shard
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert sum(r.n_docs for r in rows) == n_docs
