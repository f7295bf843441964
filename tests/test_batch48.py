"""Batch-48 tests: feature-vector consistency with component queries,
shard-manifest packing invariants."""

import hashlib

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_user_features_consistency(spark, sf_dir):
    feats = {r.user_id: r for r in REGISTRY["q_user_features"].spark(spark, sf_dir).collect()}
    ent = {r.user_id: r.entropy for r in REGISTRY["q_user_entropy"].spark(spark, sf_dir).collect()}
    n_users = read_events(spark, sf_dir).select("user_id").distinct().count()
    assert len(feats) == n_users
    for u, r in feats.items():
        assert r.frequency > 0
        assert r.lifetime_days >= 0
        assert r.has_purchased in (0, 1)
        assert abs(r.entropy - ent[u]) < 1e-9  # same definition as q_user_entropy


def test_shard_manifest_invariants(spark, sf_dir):
    rows = sorted(REGISTRY["q_shard_manifest"].spark(spark, sf_dir).collect(), key=lambda r: r.shard_id)
    chunks = {r.doc_id: (r.off, r.n_toks) for r in REGISTRY["q_concat_chunks"].spark(spark, sf_dir).collect()}
    assert sum(r.n_docs for r in rows) == len(chunks)
    assert sum(r.n_tokens for r in rows) == sum(n for _, n in chunks.values())
    # shards tile contiguous doc-id ranges (docs packed in id order)
    for a, b in zip(rows, rows[1:]):
        assert a.last_doc < b.first_doc
    # checksum reproduces from the member list
    members = sorted(d for d, (off, n) in chunks.items() if off // 20000 == rows[0].shard_id)
    expect = hashlib.md5(",".join(str(d) for d in members).encode()).hexdigest()
    assert rows[0].content_md5 == expect
