"""Batch-5 operators (registry_ext12): invariants + accuracy bounds the
oracle hash can't express."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from tests.test_plans import plan_of


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir)


def test_upsert_merge_counts_and_versions(spark, sf_dir):
    """Merged corpus = base ∪ inserts by key; every updated key carries
    the delta version; untouched keys keep version 0."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = docs.count()
    n_inserts = docs.filter(F.col("doc_id") < 20).count()
    out = _run("q_upsert_merge", spark, sf_dir).cache()
    try:
        assert out.count() == n_base + n_inserts
        assert out.select("doc_id").distinct().count() == n_base + n_inserts
        updated = out.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 100000))
        assert updated.filter(F.col("version") != 1).count() == 0
        untouched = out.filter((F.col("doc_id") % 7 != 0) & (F.col("doc_id") < 100000))
        assert untouched.filter(F.col("version") != 0).count() == 0
    finally:
        out.unpersist()


def test_containment_bounds_and_dominates_jaccard(spark, sf_dir):
    """containment(A,B) ∈ [0,1] and ≥ Jaccard(A,B) pointwise (the
    asymmetric measure can only be larger: |A∩B|/|A| ≥ |A∩B|/|A∪B|)."""
    cont = _run("q_containment_adjacent", spark, sf_dir)
    assert cont.filter(
        (F.col("containment") < 0) | (F.col("containment") > 1)
    ).count() == 0
    # jaccard over the same pair ids but token sets; shingle containment
    # vs token jaccard aren't directly comparable — recompute jaccard on
    # shingle sets for the domination check
    from arrow_supercluster_spark.operators.dedup import shingles, tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = F.array_distinct(shingles(tokenize(F.col("text"))))
    a = docs.select(F.col("doc_id").alias("a_id"), sh.alias("a_sh"))
    b = docs.select(F.col("doc_id").alias("b_id"), sh.alias("b_sh"))
    jac = (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .select(
            "a_id",
            (
                F.size(F.array_intersect("a_sh", "b_sh"))
                / F.size(F.array_union("a_sh", "b_sh")).cast("double")
            ).alias("jaccard"),
        )
    )
    joined = cont.join(jac, "a_id")
    assert joined.filter(F.col("containment") < F.col("jaccard") - 1e-6).count() == 0


def test_schema_merge_null_pattern(spark, sf_dir):
    """Each doc appears once per era; era-0 rows have text_h and null
    lang, era-1 rows the reverse."""
    out = _run("q_schema_merge", spark, sf_dir).cache()
    try:
        n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert out.count() == 2 * n
        assert out.filter(F.col("text_h").isNotNull() & F.col("lang").isNotNull()).count() == 0
        assert out.filter(F.col("text_h").isNotNull()).count() == n
        assert out.filter(F.col("lang").isNotNull()).count() == n
    finally:
        out.unpersist()


def test_approx_quantiles_accuracy(spark, sf_dir):
    """The GK sketch guarantees RANK error (≤ 1/accuracy), not value
    error — and returns an actual data point where exact percentile
    interpolates. Assert the returned value's empirical rank is within
    2% of the target quantile (1/accuracy plus the ±1/n datapoint
    granularity at test scale)."""
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    rows = _run("q_approx_quantiles", spark, sf_dir).collect()
    assert rows
    for r in rows:
        grp = ev.filter(F.col("event_type") == r.event_type)
        n = grp.count()
        for q, v in ((0.5, r.p50), (0.95, r.p95)):
            rank = grp.filter(F.col("value") <= v).count() / n
            assert abs(rank - q) <= 0.02 + 2.0 / n, (r.event_type, q, v, rank)


def test_round2_batch5_plan_gates(spark, sf_dir):
    """Upsert is one partial-aggregable shuffle (no window over the
    corpus); containment's pair join broadcasts; nothing in Python."""
    plan = plan_of(_run("q_upsert_merge", spark, sf_dir))
    assert "Window" not in plan and "EvalPython" not in plan
    # max(struct) aggregates via SortAggregate/ObjectHashAggregate —
    # still partial-aggregable, which is the property under test
    assert "Aggregate" in plan
    plan = plan_of(_run("q_containment_adjacent", spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "EvalPython" not in plan
