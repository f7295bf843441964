"""Streaming exact dedup (streaming/dedup.py) — the streaming twin must
agree with the batch E1 engine on WHAT is kept (the digest set and the
one-winner-per-digest invariant), and must keep dropping duplicates that
arrive in LATER micro-batches (the stateful part a per-batch distinct
would get wrong)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


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


def test_streaming_neardup_matches_batch_pairs(spark, sf_dir):
    """Streaming ≡ batch for near-dup (VERDICT r4 'Next round' #7): the
    stream-static LSH path over the deduped corpus must produce exactly
    the batch engine's verified candidate pair set, with the same exact
    Jaccard per pair — including signature bit-parity (the stream side
    computes signatures with the let-bound HOF expression, the batch side
    with explode/groupBy; a digest-chain mismatch would desync the band
    hashes and show up here as missing pairs)."""
    from arrow_supercluster_spark.plans.registry_ext104 import q_neardup_stream

    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in q_neardup_stream(spark, sf_dir).collect()
    }

    docs = dedup.exact_dedup(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    cand = dedup.lsh_candidate_pairs(docs, pre_dedup=False)
    want = {
        (r.a_id, r.b_id): round(r.jaccard, 9)
        for r in dedup.ngram_jaccard_pairs(docs, cand.select("a_id", "b_id")).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    assert len(want) > 0  # the corpus must actually contain near-dups


def test_minhash_signature_expr_bit_parity_with_batch(spark, sf_dir):
    """The per-row HOF signature must equal the batch explode/groupBy
    signature slot-for-slot on every document."""
    from arrow_supercluster_spark.streaming.dedup import minhash_signature_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expr = docs.select(
        "doc_id", minhash_signature_expr(F.col("text")).alias("signature")
    )
    batch = dedup.minhash_docs(docs)
    joined = expr.join(batch.withColumnRenamed("signature", "bsig"), "doc_id")
    n_docs = batch.count()
    assert (
        joined.filter(F.col("signature") == F.col("bsig")).count() == n_docs
    )
