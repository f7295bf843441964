"""Batch-87 tests: CDC fold semantics, moment formulas vs scipy-free
reference, KWIC boundary clamping."""

import tempfile

from pyspark.sql import functions as F


def test_cdc_apply_delete_and_upsert_fold(spark):
    from arrow_supercluster_spark.plans.registry_ext92 import q_cdc_apply

    with tempfile.TemporaryDirectory() as d:
        # key 1: U, U → survives with the later value
        # key 2: U, D (delete last) → absent
        # key 3: D, U (delete then upsert) → survives
        rows = [
            (11, 1, 100.0, "2024-01-01 00:00:00"),
            (21, 1, 200.0, "2024-01-02 00:00:00"),
            (31, 2, 300.0, "2024-01-01 00:00:00"),
            (48, 2, 999.0, "2024-01-02 00:00:00"),   # 48 % 10 = 8 → D
            (59, 3, 777.0, "2024-01-01 00:00:00"),   # 59 % 10 = 9 → D
            (61, 3, 400.0, "2024-01-02 00:00:00"),
        ]
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double, od string"
        ).select(
            "o_orderkey", "o_custkey", "o_totalprice",
            F.to_timestamp("od").alias("o_orderdate"),
        ).write.parquet(f"{d}/orders.parquet")
        got = {
            r.custkey: (r.last_value, r.n_ops)
            for r in q_cdc_apply(spark, d).collect()
        }
        assert got == {1: (200.0, 2), 3: (400.0, 2)}


def test_higher_moments_against_reference(spark, sf_dir):
    """Population skewness/kurtosis recomputed in pure Python (two-pass
    central moments — a DIFFERENT algorithm from the raw-moment algebra
    in the query) must agree."""
    from arrow_supercluster_spark.plans.registry_ext92 import (
        q_higher_moments,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {
        r.event_type: (r.skewness, r.excess_kurtosis)
        for r in q_higher_moments(spark, sf_dir).collect()
    }
    ev = read_events(spark, sf_dir).select("event_type", "value").collect()
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, xs in by_type.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        assert abs(got[t][0] - m3 / m2**1.5) < 1e-4, t
        assert abs(got[t][1] - (m4 / m2**2 - 3)) < 1e-4, t


def test_kwic_boundary_clamping(spark):
    from arrow_supercluster_spark.plans.registry_ext92 import q_kwic

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "window at start here"),
                (2, "ends with a window"),
                (3, "a window b window c"),
                (4, "no term at all"),
            ],
            "doc_id long, text string",
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            (r.doc_id, r.pos): (r.left_ctx, r.right_ctx)
            for r in q_kwic(spark, d).collect()
        }
        assert got == {
            (1, 1): ("", "at start"),
            (2, 4): ("with a", ""),
            (3, 2): ("a", "b window"),
            (3, 4): ("window b", "c"),
        }
