"""Batch 239 replays — execution-planning audits (R705–R707)."""

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_shuffle_plan_conservation_and_skew(spark, sf_dir):
    """Every P row conserves total bytes; skew ratio >= 1 and falls or
    holds as P shrinks relative granularity; max >= ideal."""
    rows = sorted(
        REGISTRY["q_shuffle_partition_plan"].spark(spark, sf_dir).collect(),
        key=lambda r: r.p,
    )
    assert [r.p for r in rows] == [8, 32, 128, 512]
    totals = {r.total_bytes for r in rows}
    assert len(totals) == 1  # same fact bytes at every P
    for r in rows:
        assert r.ideal_bytes == r.total_bytes // r.p
        assert r.max_bucket_bytes >= r.ideal_bytes
        assert r.skew_ratio >= 1.0


def test_checkpoint_interval_formula(spark, sf_dir):
    r = REGISTRY["q_checkpoint_interval"].spark(spark, sf_dir).collect()[0]
    assert r.n_errors > 1
    mtbf = r.span_sec / (r.n_errors - 1)
    assert abs(r.mtbf_sec - round(mtbf, 2)) < 1e-9
    assert abs(r.t_opt_sec - round(math.sqrt(120.0 * r.span_sec / (r.n_errors - 1)), 2)) < 1e-9
    # Young's interval is far below MTBF when delta << MTBF
    assert r.t_opt_sec < r.mtbf_sec


def test_broadcast_choice_consistent(spark, sf_dir):
    rows = REGISTRY["q_broadcast_choice"].spark(spark, sf_dir).collect()
    assert {r.tbl for r in rows} == {
        "nation", "region", "supplier", "part", "customer"
    }
    for r in rows:
        want = "broadcast" if r.est_bytes <= 100_000 else "shuffle"
        assert r.strategy == want
        assert r.est_bytes > r.n_rows * 8  # width model floor
    # nation/region are always tiny
    by = {r.tbl: r for r in rows}
    assert by["nation"].strategy == "broadcast"
    assert by["region"].strategy == "broadcast"
