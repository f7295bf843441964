"""Batch-4 operators (registry_ext11): invariants + scale-shape plan
gates. Oracle value parity is covered by test_oracle_parity; these are
the semantic checks the hash can't express."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import centroids
from arrow_supercluster_spark.plans.registry import REGISTRY
from tests.test_plans import plan_of


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir)


def test_quantize_bounds_and_reconstruction(spark, sf_dir):
    """int8 range respected; max reconstruction error ≤ scale/2 (the
    round-to-nearest guarantee)."""
    out = _run("q_embedding_quantize", spark, sf_dir)
    bad = out.filter(
        (F.array_min("q") < -127)
        | (F.array_max("q") > 127)
        # max_err is rounded to 1e-6 in the output — allow half a grid step
        | (F.col("max_err") > F.col("scale") / 2 + 5e-7)
    )
    assert bad.count() == 0
    assert out.count() > 0


def test_tfidf_topk_per_doc(spark, sf_dir):
    out = _run("q_tfidf_terms", spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert per_doc.filter(F.col("n") > 3).count() == 0
    assert out.filter(F.col("tfidf") <= 0).count() == 0


def test_sliding_windows_cover_each_event_4x(spark, sf_dir):
    """1h window / 15min slide ⇒ every event lands in exactly 4 windows."""
    out = _run("q_sliding_windows", spark, sf_dir)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == 4 * n_events


def test_kmeans_step_partition_of_corpus(spark, sf_dir):
    """Assignment partitions the corpus: sizes sum to |vectors|, every
    centroid has the embedding dimensionality, and the step is
    partition-count invariant (determinism under repartitioning)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = centroids.kmeans_step(emb, k=8).cache()
    assert out.agg(F.sum("n_vecs")).collect()[0][0] == emb.count()
    dims = out.select(F.size("centroid").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [64]
    again = centroids.kmeans_step(emb.repartition(7), k=8)
    assert out.subtract(again).count() == 0 and again.subtract(out).count() == 0


def test_median_filter_keeps_strict_upper_half(spark, sf_dir):
    """Per language: kept docs are a strict minority-or-half (strictly
    above the median) and every kept doc beats its language median."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = _run("q_median_length_filter", spark, sf_dir)
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect():
        assert r.n <= totals[r.lang] / 2 + 1


def test_boilerplate_counts_bounded(spark, sf_dir):
    out = _run("q_boilerplate_ngrams", spark, sf_dir)
    assert out.filter(F.col("n_boiler") > F.col("n_grams")).count() == 0
    assert out.filter(
        (F.col("boiler_frac") < 0) | (F.col("boiler_frac") > 1)
    ).count() == 0


def test_round2_batch4_plan_gates(spark, sf_dir):
    """Scale shapes: quantization is a pure narrow map (zero Exchange);
    stats/threshold/df tables come back as broadcasts; k-means
    assignment joins nothing (literal centroids) — the only Exchanges
    are the two scalar-component aggs + the k-row result join; nothing
    drops to Python."""
    plan = plan_of(_run("q_embedding_quantize", spark, sf_dir))
    assert "Exchange" not in plan and "EvalPython" not in plan

    for name in ("q_zscore_outliers", "q_median_length_filter",
                 "q_tfidf_terms", "q_boilerplate_ngrams"):
        plan = plan_of(_run(name, spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "EvalPython" not in plan, name

    plan = plan_of(_run("q_sliding_windows", spark, sf_dir))
    assert plan.count("Exchange") == 1 and "EvalPython" not in plan

    plan = plan_of(_run("q_kmeans_step", spark, sf_dir))
    assert "EvalPython" not in plan
    # assignment is join-free: the only join merges the 8-row sizes and
    # centroid tables at the end
    assert "NestedLoop" not in plan
