"""Batch-57 tests: dedup-savings consistency with keepers, sample-bias
shares."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_dedup_savings_consistency(spark, sf_dir):
    rows = REGISTRY["q_dedup_savings"].spark(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keepers = REGISTRY["q_dedup_exact"].spark(spark, sf_dir).count()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert sum(r.n_removable for r in rows) == docs.count() - keepers
    for r in rows:
        assert 0.0 <= r.byte_fraction_saved <= 1.0
        assert r.chars_saved >= r.tokens_saved  # tokens <= chars


def test_sample_bias_shares(spark, sf_dir):
    rows = REGISTRY["q_sample_bias"].spark(spark, sf_dir).collect()
    assert abs(sum(r.sample_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.corpus_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.n_sample <= 25
        assert r.chi2_term >= 0
    # equal quotas over a skewed corpus MUST distort -> chi2 > 0 unless
    # the corpus is perfectly balanced
    shares = {round(r.corpus_share, 3) for r in rows}
    if len(shares) > 1:
        assert sum(r.chi2_term for r in rows) > 0
