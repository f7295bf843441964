"""Batch-182 tests: consistent-hash ring replay + churn bound, HRW
minimal-churn theorem, range/hash shard replay + conservation."""

import numpy as np


def _doc_ids(spark, sf_dir):
    return [
        r.doc_id
        for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).select("doc_id").collect()
    ]


def test_consistent_hash_matches_replay_and_churn_bound(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext187 import (
        _CH_DOC_MULT,
        _CH_M,
        _CH_NODE_MULT,
        _CH_REPLICAS,
        _CH_SHARDS,
        q_consistent_hash,
    )

    ids = _doc_ids(spark, sf_dir)

    def ring(n):
        return sorted(
            (((s * 131 + r) * _CH_NODE_MULT + 7) % _CH_M, s)
            for s in range(n)
            for r in range(_CH_REPLICAS)
        )

    def assign(ring_sorted, doc_id):
        pos = (doc_id * _CH_DOC_MULT) % _CH_M
        for p, s in ring_sorted:
            if p >= pos:
                return s
        return ring_sorted[0][1]

    r8, r9 = ring(_CH_SHARDS), ring(_CH_SHARDS + 1)
    want = {}
    moved_total = 0
    for d in ids:
        s8 = assign(r8, d)
        s9 = assign(r9, d)
        w = want.setdefault(s8, [0, 0])
        w[0] += 1
        if s9 != s8:
            w[1] += 1
            moved_total += 1
            # ring churn moves keys ONLY to the new shard
            assert s9 == _CH_SHARDS
    rows = {r.shard: r for r in q_consistent_hash(spark, sf_dir).collect()}
    assert {k: (v.n_docs_8, v.n_moved_on_expand) for k, v in rows.items()} \
        == {k: tuple(v) for k, v in want.items()}
    # churn is bounded: well under half, around 1/(n+1) in expectation
    assert moved_total / len(ids) < 0.5


def test_rendezvous_matches_replay_and_minimal_churn(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext187 import (
        _CH_M,
        _CH_NODE_MULT,
        _CH_SHARDS,
        q_rendezvous_hash,
    )

    ids = _doc_ids(spark, sf_dir)

    def w(d, s):
        return ((d * 31 + s) * _CH_NODE_MULT) % _CH_M

    want = {}
    for d in ids:
        weights = [(w(d, s), -s) for s in range(_CH_SHARDS + 1)]
        s8 = -max(weights[:_CH_SHARDS])[1]
        s9 = -max(weights)[1]
        v = want.setdefault(s8, [0, 0])
        v[0] += 1
        if s9 != s8:
            v[1] += 1
            assert s9 == _CH_SHARDS  # HRW minimal churn
    rows = {r.shard: r for r in q_rendezvous_hash(spark, sf_dir).collect()}
    assert {k: (v.n_docs_8, v.n_moved_on_expand) for k, v in rows.items()} \
        == {k: tuple(v) for k, v in want.items()}
    assert all(r.moves_only_to_new for r in rows.values())


def test_range_vs_hash_shard_replay_and_conservation(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext187 import (
        _CH_NODE_MULT,
        _CH_SHARDS,
        q_range_vs_hash_shard,
    )

    chars = [
        r.n_chars
        for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).select("n_chars").collect()
    ]
    cuts = [
        np.quantile(chars, i / _CH_SHARDS)
        for i in range(1, _CH_SHARDS)
    ]
    rng, hsh = {}, {}
    for c in chars:
        rs = sum(1 for b in cuts if b < c)
        rng[rs] = rng.get(rs, 0) + 1
        hs = (c * _CH_NODE_MULT) % _CH_SHARDS
        hsh[hs] = hsh.get(hs, 0) + 1
    rows = q_range_vs_hash_shard(spark, sf_dir).collect()
    got_r = {r.shard: r.n_docs for r in rows if r.strategy == "range"}
    got_h = {r.shard: r.n_docs for r in rows if r.strategy == "hash"}
    assert got_r == rng and got_h == hsh
    assert sum(got_r.values()) == sum(got_h.values()) == len(chars)
    # range shards hold contiguous, non-overlapping key ranges
    rr = sorted(
        (r.shard, r.key_lo, r.key_hi)
        for r in rows if r.strategy == "range"
    )
    for (s1, _, hi1), (s2, lo2, _) in zip(rr, rr[1:]):
        assert hi1 <= lo2
