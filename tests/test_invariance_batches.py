"""Partition-count invariance for the round-2 batch 4-7 operators:
identical results under different spark.sql.shuffle.partitions — the
metamorphic check SURVEY §5 layer 2 names as the one a naive distributed
port silently fails (every float was rounded BEFORE a comparison or
output for exactly this reason)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import pytest

from arrow_supercluster_spark.plans.registry import REGISTRY

_QUERIES = [
    "q_embedding_quantize",
    "q_tfidf_terms",
    "q_zscore_outliers",
    "q_boilerplate_ngrams",
    "q_sliding_windows",
    "q_median_length_filter",
    "q_upsert_merge",
    "q_containment_adjacent",
    "q_rolling_avg",
    "q_resample_ffill",
    "q_json_schema_parse",
    "q_pivot_counts",
    "q_source_lang_kl",
    "q_pagerank",
    "q_embedding_stats",
    "q_embedding_standardize",
    "q_json_corrupt_audit",
    "q_first_last_agg",
    "q_cross_source_overlap",
    "q_ntile_quartiles",
    "q_regex_extract_all",
    "q_dedup_best_keeper",
    "q_curation_verdict",
    "q_chunk_dedup",
    "q_haversine_segments",
    "q_funnel_conversion",
    "q_retention_cohorts",
    "q_event_dedup_window",
    "q_string_agg",
]


@pytest.mark.parametrize("name", _QUERIES)
def test_partition_invariance(name, spark, sf_dir):
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = REGISTRY[name].spark(spark, sf_dir)
        rows_a = sorted(map(str, a.collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = REGISTRY[name].spark(spark, sf_dir)
        rows_b = sorted(map(str, b.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert rows_a == rows_b, name
