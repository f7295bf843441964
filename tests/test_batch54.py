"""Batch-54 tests: split disjoint/exhaustive/deterministic, dataset-card
consistency with component queries."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_holdout_split_partitions_corpus(spark, sf_dir):
    rows = REGISTRY["q_holdout_split"].spark(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(r.n for r in rows) == docs.count()  # exhaustive
    splits = {r.split for r in rows}
    assert splits <= {"train", "val", "test"}
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n
    # rough 90/5/5 shape (hash noise tolerated)
    total = sum(by_split.values())
    assert by_split["train"] / total > 0.8
    # deterministic across invocations
    again = {(r.split, r.lang, r.n) for r in REGISTRY["q_holdout_split"].spark(spark, sf_dir).collect()}
    assert again == {(r.split, r.lang, r.n) for r in rows}


def test_dataset_card_consistency(spark, sf_dir):
    card = REGISTRY["q_dataset_card"].spark(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert card.n_docs == docs.count()
    assert card.n_langs == docs.select("lang").distinct().count()
    assert card.n_sources == docs.select("source").distinct().count()
    # dup rate consistent with the exact-dedup keeper count
    keepers = REGISTRY["q_dedup_exact"].spark(spark, sf_dir).count()
    assert card.n_unique == keepers
    assert abs(card.dup_rate - (1 - keepers / card.n_docs)) < 1e-9
    assert card.total_chars >= card.total_tokens  # tokens are space-separated
