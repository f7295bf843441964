"""Batch-185 tests: data-contract replay on clean data + a crafted
violation fixture proving each rule can actually fire."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import pandas as pd
from pyspark.sql import functions as F


def test_data_contract_clean_on_driver_data(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext190 import (
        q_data_contract,
    )

    rows = {(r.tbl, r.rule): r for r in
            q_data_contract(spark, sf_dir).collect()}
    assert len(rows) == 6
    # counts match the tables
    assert rows[("documents", "unique_doc_id")].n_checked == \
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert rows[("orders", "fk_custkey")].n_checked == \
        spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    # the synthetic tables satisfy every contract
    for r in rows.values():
        assert r.passed and r.n_violations == 0


def test_data_contract_rules_fire_on_crafted_violations(spark, tmp_path):
    """Write a tiny corrupt fixture (orphan FK, dup id, empty text,
    out-of-range value, stale ts) and check every rule counts it."""
    import datetime

    from arrow_supercluster_spark.plans.registry_ext190 import (
        q_data_contract,
    )

    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "c_custkey long, c_name string"
    ).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(10, 1), (11, 99)], "o_orderkey long, o_custkey long"
    ).write.parquet(f"{d}/orders.parquet")  # 99 = orphan
    spark.createDataFrame(
        [(10, 1), (77, 1)], "l_orderkey long, l_linenumber long"
    ).write.parquet(f"{d}/lineitem.parquet")  # 77 = orphan
    spark.createDataFrame(
        [(1, "ok", "en", "s", 2), (1, " ", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")  # dup id + empty text
    spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 1, 2), 5, "click", 50.0, "{}"),
            (2, datetime.datetime(2023, 6, 1), 5, "click", -1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{d}/events.parquet")  # stale ts + negative value

    rows = {(r.tbl, r.rule): r for r in q_data_contract(spark, d).collect()}
    assert rows[("orders", "fk_custkey")].n_violations == 1
    assert rows[("lineitem", "fk_orderkey")].n_violations == 1
    assert rows[("documents", "unique_doc_id")].n_violations == 1
    assert rows[("documents", "text_nonempty")].n_violations == 1
    assert rows[("events", "value_in_range")].n_violations == 1
    assert rows[("events", "ts_fresh_window")].n_violations == 1
    assert not any(r.passed for r in rows.values())
