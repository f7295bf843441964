"""Streaming exact deduplication — the Structured Streaming twin of the
batch E1 surface (operators/dedup.exact_dedup), VERDICT r3 "Next round"
#5.

Batch E1 groups the corpus by md5(normalized text) and keeps min(doc_id).
A stream can't wait for "all rows of a digest" — the streaming contract
is first-wins: the FIRST-arriving document of each digest is emitted,
every later duplicate is dropped, and the digest store is TTL-bounded by
the event-time watermark (`dropDuplicatesWithinWatermark`): a digest
older than the watermark is evicted from state, so state size is
O(docs per watermark window), not O(corpus) — the property that makes
this runnable forever at ingest scale. (The trade: a duplicate arriving
AFTER its original has aged out re-emits. That is the standard
streaming-dedup contract; exactness across all time is the batch
engine's job.)

Late data: rows older than the watermark are dropped by the watermark
operator itself (drop-late), the same policy as every other streaming
entry here (streaming/events.py).

Scale notes (100 TB/day ingest): the digest is computed as a narrow JVM
projection (md5 over the normalized text — same expression as batch E1,
operators/dedup.normalize_text), so only (digest + carried columns)
reach the state store; state is hash-partitioned by digest across
executors exactly like the batch groupBy shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import normalize_text


def streaming_dedup_exact(
    docs_stream: DataFrame,
    watermark: str = "2 hours",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """readStream(documents with an event-time `ts_col`) → first document
    per md5(normalized text) digest, duplicates within the watermark
    dropped, digest state TTL-evicted at the watermark.

    Emits the kept rows with their `text_hash` attached (append mode —
    each digest's winner is emitted exactly once while its state entry
    lives)."""
    digested = docs_stream.withColumn(
        "text_hash", F.md5(normalize_text(F.col("text")))
    )
    return digested.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )


def streaming_contamination_hits(
    docs_stream: DataFrame, eval_grams: DataFrame, n: int = 8
) -> DataFrame:
    """Streaming decontamination (the E-decontam streaming twin): every
    arriving training document's word n-gram digests are checked against
    a STATIC eval-gram table via a stream-static broadcast join —
    stateless (append mode, no watermark needed), so it runs at ingest
    forever. Emits one (doc_id, g) row per gram hit; per-doc overlap
    counts are mergeable, so the consumer aggregates per micro-batch
    (foreachBatch / memory sink) — the same counts-stream / finisher
    split as streaming/events.trending_counts. The eval side is MB-scale
    by nature (benchmarks), computed once by the batch engine
    (operators/decontam.doc_ngram_digests) and broadcast per batch."""
    from pyspark.sql import functions as F  # noqa: F811

    from arrow_supercluster_spark.operators.decontam import doc_ngram_digests

    grams = doc_ngram_digests(docs_stream, n)
    return grams.join(F.broadcast(eval_grams.select("g")), "g").select(
        "doc_id", "g"
    )
