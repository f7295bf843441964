"""Batch-88 tests: U-shaped credit, business-day arithmetic, Markov
removal effects on a hand-enumerable funnel."""

import tempfile

from pyspark.sql import functions as F


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, t string"
    ).select(
        "event_id", F.to_timestamp("t").alias("ts"), "user_id",
        "event_type", F.lit(1.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    ).write.parquet(f"{d}/events.parquet")


def test_multitouch_position_credit(spark):
    from arrow_supercluster_spark.plans.registry_ext93 import q_multitouch

    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark, d,
            [
                # user 1: view, click, signup, view → purchase (4 touches:
                # U-shape 0.4 view / 0.1 click / 0.1 signup / 0.4 view)
                (1, 1, "view", "2024-01-01 00:00:00"),
                (2, 1, "click", "2024-01-01 00:01:00"),
                (3, 1, "signup", "2024-01-01 00:02:00"),
                (4, 1, "view", "2024-01-01 00:03:00"),
                (5, 1, "purchase", "2024-01-01 00:04:00"),
                # user 2: single touch → 1.0 click
                (6, 2, "click", "2024-01-01 00:00:00"),
                (7, 2, "purchase", "2024-01-01 00:01:00"),
                # user 3: two touches → 0.5 / 0.5
                (8, 3, "view", "2024-01-01 00:00:00"),
                (9, 3, "click", "2024-01-01 00:01:00"),
                (10, 3, "purchase", "2024-01-01 00:02:00"),
                # user 4: no purchase → no credit
                (11, 4, "view", "2024-01-01 00:00:00"),
            ],
        )
        got = {
            r.event_type: (r.credit, r.n_touches)
            for r in q_multitouch(spark, d).collect()
        }
        assert got == {
            "view": (round(0.4 + 0.4 + 0.5, 6), 3),
            "click": (round(0.1 + 1.0 + 0.5, 6), 3),
            "signup": (0.1, 1),
        }


def test_business_day_arithmetic(spark):
    """Hand-checked spans via the registered query on a crafted
    warehouse: Mon→Fri same week = 4 business days; Fri→Mon = 1;
    Sat→Mon = 1; Mon→next Mon = 5."""
    from arrow_supercluster_spark.plans.registry_ext93 import (
        q_business_days,
    )

    cases = [
        # (orderkey, orderdate, shipdate, expected_bus_days)
        (1, "2024-01-01", "2024-01-05", 4),   # Mon → Fri
        (2, "2024-01-05", "2024-01-08", 1),   # Fri → Mon
        (3, "2024-01-06", "2024-01-08", 1),   # Sat → Mon
        (4, "2024-01-01", "2024-01-08", 5),   # Mon → Mon
        (5, "2024-01-01", "2024-01-01", 0),   # same day
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(k, f"P{k}", od) for k, od, _, _ in cases],
            "o_orderkey long, o_orderpriority string, od string",
        ).select(
            "o_orderkey", "o_orderpriority",
            F.to_timestamp("od").alias("o_orderdate"),
        ).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame(
            [(k, sd) for k, _, sd, _ in cases],
            "l_orderkey long, sd string",
        ).select(
            "l_orderkey", F.to_timestamp("sd").alias("l_shipdate")
        ).write.parquet(f"{d}/lineitem.parquet")
        got = {
            r.priority: r.max_bus_days
            for r in q_business_days(spark, d).collect()
        }
        for k, _, _, want in cases:
            assert got[f"P{k}"] == want, (k, got[f"P{k}"], want)


def test_markov_attribution_hand_funnel(spark):
    """Every conversion passes through 'gate' → removing it kills all
    conversions (effect 1.0); 'noise' appears only in non-converting
    journeys → effect 0; shares normalize."""
    from arrow_supercluster_spark.plans.registry_ext93 import (
        q_markov_attribution,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_events(
            spark, d,
            [
                (1, 1, "gate", "2024-01-01 00:00:00"),
                (2, 1, "purchase", "2024-01-01 00:01:00"),
                (3, 2, "gate", "2024-01-01 00:00:00"),
                (4, 2, "purchase", "2024-01-01 00:01:00"),
                (5, 3, "noise", "2024-01-01 00:00:00"),
                (6, 4, "noise", "2024-01-01 00:00:00"),
            ],
        )
        got = {
            r.channel: (r.removal_effect, r.share)
            for r in q_markov_attribution(spark, d).collect()
        }
        assert got["gate"] == (1.0, 1.0)
        assert got["noise"] == (0.0, 0.0)
