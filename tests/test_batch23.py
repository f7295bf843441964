"""Batch-23 tests: distributed prefix sum vs naive window + partition
invariance, chunk-packing conservation, calendar-gap complement, and
compaction file counts."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import os
import tempfile

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.functions.prefix import global_prefix_sum
from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.compact import compact_parquet
from arrow_supercluster_spark.sources.tables import read_events


def test_prefix_sum_matches_naive_and_partition_invariant(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), ((F.col("id") * 7) % 13).alias("v")
    )
    naive = df.withColumn(
        "expect",
        F.coalesce(
            F.sum("v").over(
                Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    expected = {r.k: r.expect for r in naive.collect()}
    for n in (1, 4, 11):
        got = {
            r.k: r.cum_before
            for r in global_prefix_sum(df, "k", "v", num_partitions=n).collect()
        }
        assert got == expected, n


def test_concat_chunks_conservation(spark, sf_dir):
    rows = REGISTRY["q_concat_chunks"].spark(spark, sf_dir).collect()
    total = sum(r.n_toks for r in rows)
    # offsets tile the concatenated stream exactly
    by_off = sorted(rows, key=lambda r: r.off)
    acc = 0
    for r in by_off:
        assert r.off == acc
        acc += r.n_toks
    assert acc == total
    for r in rows:
        assert r.first_bin == r.off // 512
        if r.n_toks > 0:
            assert r.last_bin == (r.off + r.n_toks - 1) // 512
        assert r.n_bins == r.last_bin - r.first_bin + 1
    # docs in doc_id order = offset order
    assert [r.doc_id for r in by_off] == sorted(r.doc_id for r in rows)


def test_calendar_gaps_complement(spark, sf_dir):
    gaps = REGISTRY["q_calendar_gaps"].spark(spark, sf_dir)
    ev = read_events(spark, sf_dir)
    obs = ev.select(
        "event_type", F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us")
    ).distinct()
    # gap ∩ observed = ∅
    assert gaps.join(obs, ["event_type", "hour_us"]).count() == 0
    # gaps + observed = full grid
    b = obs.agg(F.min("hour_us").alias("h0"), F.max("hour_us").alias("h1")).collect()[0]
    n_hours = (b.h1 - b.h0) // 3_600_000_000 + 1
    n_types = ev.select("event_type").distinct().count()
    assert gaps.count() + obs.count() == n_hours * n_types


def test_compaction_reduces_file_count(spark, sf_dir):
    ev = read_events(spark, sf_dir).select("event_id", "user_id", "value")
    base = tempfile.mkdtemp(prefix="compact_test_")
    small, out = f"{base}/small", f"{base}/out"
    ev.repartition(24).write.mode("overwrite").parquet(small)
    n_small = len([f for f in os.listdir(small) if f.endswith(".parquet")])
    assert n_small == 24
    n_out = compact_parquet(spark, small, out, target_bytes=1 << 30)
    assert n_out == 1  # everything fits one 1 GiB target file
    assert spark.read.parquet(out).count() == ev.count()
    # content identical (key-sorted sample)
    a = sorted(r.event_id for r in spark.read.parquet(out).collect())
    b = sorted(r.event_id for r in ev.collect())
    assert a == b
