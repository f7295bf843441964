"""Batch-6 operators (registry_ext13): invariants + plan gates."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events
from tests.test_plans import plan_of


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir)


def test_orc_roundtrip_lossless(spark, sf_dir):
    out = _run("q_orc_roundtrip", spark, sf_dir)
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == n
    assert out.filter(F.col("ts_us").isNull()).count() == 0


def test_resample_grid_dense_and_filled(spark, sf_dir):
    """Grid covers every hour between each user's bounds; after a user's
    first observed hour the fill is never null."""
    out = _run("q_resample_ffill", spark, sf_dir).cache()
    try:
        spans = out.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            ((F.max("h_ts") - F.min("h_ts")) / 3600 + 1).alias("expect"),
        )
        assert spans.filter(F.col("n") != F.col("expect")).count() == 0
        # first grid hour aggregates the user's first event → non-null
        # from the very first row; ffill keeps it non-null throughout
        assert out.filter(F.col("v_fill").isNull()).count() == 0
    finally:
        out.unpersist()


def test_rolling_avg_row_preserving(spark, sf_dir):
    out = _run("q_rolling_avg", spark, sf_dir)
    ev = read_events(spark, sf_dir)
    assert out.count() == ev.count()
    assert out.filter(F.col("ma7").isNull()).count() == 0


def test_json_schema_parse_counts(spark, sf_dir):
    out = _run("q_json_schema_parse", spark, sf_dir)
    totals = out.agg(F.sum("n_k")).collect()[0][0]
    n = read_events(spark, sf_dir).count()
    assert totals == n  # every props string parses in the testdata


def test_round2_batch6_plan_gates(spark, sf_dir):
    """Windows partition by user (bounded keys); JSON parse is one
    narrow projection + one agg Exchange; nothing drops to Python."""
    for name in ("q_resample_ffill", "q_rolling_avg"):
        plan = plan_of(_run(name, spark, sf_dir))
        assert "Window" in plan and "EvalPython" not in plan
    plan = plan_of(_run("q_json_schema_parse", spark, sf_dir))
    assert plan.count("Exchange") == 1 and "EvalPython" not in plan


def test_json_corrupt_audit_counts(spark, sf_dir):
    """Corruption injected on event_id % 13 == 0 — the per-type corrupt
    counts must sum to exactly that population."""
    out = _run("q_json_corrupt_audit", spark, sf_dir)
    ev = read_events(spark, sf_dir)
    expected = ev.filter(F.col("event_id") % 13 == 0).count()
    got = out.agg(F.sum("n_corrupt")).collect()[0][0]
    assert got == expected
