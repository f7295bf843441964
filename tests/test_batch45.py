"""Batch-45 tests: PSI total interpretation, date-dim coverage, negative
pair determinism/validity."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_psi_terms_and_total(spark, sf_dir):
    rows = REGISTRY["q_psi_drift"].spark(spark, sf_dir).collect()
    assert rows
    total = sum(r.psi_term for r in rows)
    # PSI is a sum of (p-q)ln(p/q) terms, each >= 0
    for r in rows:
        assert r.psi_term >= 0
    assert 0 <= total < 25  # sane magnitude
    # early+late counts cover all non-null values
    n = read_events(spark, sf_dir).filter(F.col("value").isNotNull()).count()
    assert sum(r.n_early + r.n_late for r in rows) <= n  # zero-buckets filtered


def test_date_dim_coverage(spark, sf_dir):
    rows = sorted(REGISTRY["q_date_dim"].spark(spark, sf_dir).collect(), key=lambda r: r.day_us)
    # contiguous days
    for a, b in zip(rows, rows[1:]):
        assert b.day_us - a.day_us == 86400000000
    ev_total = read_events(spark, sf_dir).count()
    assert sum(r.n_events for r in rows) == ev_total
    for r in rows:
        assert 0 <= r.dow <= 6 and 1 <= r.month <= 12 and 1 <= r.quarter <= 4
        assert r.is_weekend == int(r.dow in (0, 6))


def test_negative_pairs_validity(spark, sf_dir):
    rows = REGISTRY["q_negative_pairs"].spark(spark, sf_dir).collect()
    docs = {r.doc_id for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert rows
    seen = set()
    for r in rows:
        assert r.a_id != r.b_id
        assert r.b_id in docs
        seen.add((r.a_id, r.draw))
    # deterministic: rerun gives the same pair set
    again = {(r.a_id, r.b_id, r.draw) for r in REGISTRY["q_negative_pairs"].spark(spark, sf_dir).collect()}
    assert again == {(r.a_id, r.b_id, r.draw) for r in rows}
    # most anchors keep most of their 4 draws (self-collisions are rare)
    assert len(rows) > 3 * len(docs)
