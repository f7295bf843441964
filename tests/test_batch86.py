"""Batch-86 tests: session_window semantics, UDTF RLE partition
isolation, VARIANT extraction equivalence."""

import tempfile

from pyspark.sql import functions as F


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, t string"
    ).select(
        "event_id", F.to_timestamp("t").alias("ts"), "user_id",
        "event_type", F.lit(1.0).alias("value"),
        F.lit('{"k": 7}').alias("props"),
    ).write.parquet(f"{d}/events.parquet")


def test_session_window_gap_semantics(spark):
    """Two sessions split by a >30-min gap; window end = last event +
    gap (Spark's documented session_window semantics, mirrored by the
    islands oracle)."""
    from arrow_supercluster_spark.plans.registry_ext91 import (
        q_session_window,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark, d,
            [
                (1, 1, "click", "2024-01-01 00:00:00"),
                (2, 1, "click", "2024-01-01 00:20:00"),   # same session
                (3, 1, "click", "2024-01-01 01:10:00"),   # 50-min gap → new
                (4, 2, "view", "2024-01-01 00:00:00"),    # other user
            ],
        )
        rows = sorted(
            q_session_window(spark, d).collect(),
            key=lambda r: (r.user_id, r.session_start),
        )
        assert len(rows) == 3
        s1, s2, s3 = rows
        assert (s1.user_id, s1.n_events) == (1, 2)
        assert s1.session_end == s1.session_start.replace(minute=50)
        assert (s2.user_id, s2.n_events) == (1, 1)
        assert (s3.user_id, s3.n_events) == (2, 1)


def test_udtf_rle_runs_and_partition_isolation(spark):
    """Run boundaries within a user, no state bleed across users (users
    interleave in event-id order on purpose)."""
    from arrow_supercluster_spark.plans.registry_ext91 import q_udtf_rle

    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark, d,
            [
                (1, 1, "a", "2024-01-01 00:00:00"),
                (2, 2, "a", "2024-01-01 00:00:30"),
                (3, 1, "a", "2024-01-01 00:01:00"),
                (4, 1, "b", "2024-01-01 00:02:00"),
                (5, 2, "b", "2024-01-01 00:02:30"),
                (6, 1, "a", "2024-01-01 00:03:00"),
            ],
        )
        got = {
            (r.user_id, r.run_idx): (r.event_type, r.run_len)
            for r in q_udtf_rle(spark, d).collect()
        }
        assert got == {
            (1, 0): ("a", 2),
            (1, 1): ("b", 1),
            (1, 2): ("a", 1),
            (2, 0): ("a", 1),
            (2, 1): ("b", 1),
        }


def test_variant_agg_matches_json_tuple_path(spark, sf_dir):
    """The VARIANT extraction must agree with the legacy string-parse
    path (get_json_object) on every group."""
    from arrow_supercluster_spark.plans.registry_ext91 import q_variant_agg
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.event_type: (r.n, r.avg_k, r.max_k)
           for r in q_variant_agg(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir)
    legacy = {
        r.event_type: (r.n, r.avg_k, r.max_k)
        for r in ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .collect()
    }
    assert got == legacy
