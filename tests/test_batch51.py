"""Batch-51 tests: kNN-graph invariants, PII density consistency with
the per-doc scrub."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_knn_graph_invariants(spark, sf_dir):
    row = REGISTRY["q_knn_graph_stats"].spark(spark, sf_dir).collect()[0]
    assert row.n_directed == 5 * row.n_nodes
    assert 0 <= row.n_mutual <= row.n_directed // 2
    assert 0.0 <= row.reciprocity <= 1.0
    assert row.max_indegree >= 1
    assert 0 <= row.n_never_retrieved < row.n_nodes


def test_pii_density_consistency(spark, sf_dir):
    dens = {r.source: r for r in REGISTRY["q_pii_density"].spark(spark, sf_dir).collect()}
    scrub = REGISTRY["q_pii_scrub"].spark(spark, sf_dir).collect()
    docs = {r.doc_id: r.source for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    agg = {}
    for r in scrub:
        src = docs[r.doc_id]
        e, p = agg.get(src, (0, 0))
        agg[src] = (e + r.n_emails, p + r.n_phones)
    for src, (e, p) in agg.items():
        assert dens[src].n_emails == e
        assert dens[src].n_phones == p
        assert dens[src].pii_per_1k_chars >= 0
    # the injected PII (every 7th doc) guarantees nonzero density overall
    assert sum(r.n_emails for r in dens.values()) > 0
