"""Streaming exact dedup (streaming/dedup.py) — the streaming twin must
agree with the batch E1 engine on WHAT is kept (the digest set and the
one-winner-per-digest invariant), and must keep dropping duplicates that
arrive in LATER micro-batches (the stateful part a per-batch distinct
would get wrong)."""

import time

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import dedup
from arrow_supercluster_spark.plans.registry_ext84 import (
    documents_with_ingest_ts,
)
from arrow_supercluster_spark.streaming.dedup import streaming_dedup_exact


def _run_stream(spark, src, schema, name):
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_dedup_matches_batch_digest_set(spark, sf_dir, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sdedup_src"))
    docs = documents_with_ingest_ts(spark, sf_dir)
    docs.write.mode("overwrite").parquet(src)
    got = _run_stream(spark, src, docs.schema, "sdedup_once")

    batch = dedup.exact_dedup_groups(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    got_digests = {r.text_hash for r in got.select("text_hash").collect()}
    want_digests = {r.text_hash for r in batch.select("text_hash").collect()}
    assert got_digests == want_digests
    # exactly one winner per digest
    assert got.count() == len(got_digests)


def test_streaming_dedup_drops_cross_batch_duplicates(spark, tmp_path_factory):
    """Micro-batch 1 delivers doc A; micro-batch 2 re-delivers A's text
    (later ts, within watermark) plus a fresh doc B. The second batch
    must emit ONLY B — the digest state carries across batches."""
    src = str(tmp_path_factory.mktemp("sdedup_inc"))
    b1 = spark.createDataFrame(
        [(1, "same text here")], "doc_id long, text string"
    ).withColumn("ingest_ts", F.timestamp_seconds(F.lit(1704067200)))
    b1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, ingest_ts timestamp"
    ).parquet(src)
    q = (
        streaming_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName("sdedup_inc")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("sdedup_inc").count() == 1

        b2 = spark.createDataFrame(
            [(2, "same text here"), (3, "brand new text")],
            "doc_id long, text string",
        ).withColumn("ingest_ts", F.timestamp_seconds(F.lit(1704067260)))
        b2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.table("sdedup_inc").collect()
    finally:
        q.stop()
        for _ in range(20):
            if not q.isActive:
                break
            time.sleep(0.5)
    assert len(rows) == 2, rows
    kept_ids = sorted(r.doc_id for r in rows)
    assert kept_ids == [1, 3]  # the re-delivered duplicate (id 2) dropped


def test_streaming_decontamination_matches_batch(spark, sf_dir):
    """The streaming gram-hit pipeline aggregated per doc must equal the
    batch engine's decontaminate() output exactly (same digests, same
    eval slice)."""
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.operators import decontam
    from arrow_supercluster_spark.plans.registry import REGISTRY

    got = {
        r.doc_id: r.n_overlap
        for r in REGISTRY["q_decontam_stream"].spark(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r.doc_id: r.n_overlap
        for r in decontam.decontaminate(
            docs, eval_pred=F.col("doc_id") % 29 == 0, n=8
        ).collect()
    }
    assert got == want
