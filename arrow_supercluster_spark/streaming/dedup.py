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


def minhash_signature_expr(text_col, num_hashes: int = 16, shingle_k: int = 3):
    """Per-ROW MinHash signature as one stateless expression — the
    streaming-side twin of the batch explode/groupBy construction
    (operators/dedup.minhash_docs): a stream row can compute its own
    signature without a streaming aggregation (which would force
    watermarked state for a value that is a pure function of the row).

    Bit-parity with batch: identical digest chain (xxhash64(shingle) →
    min over xxhash64(digest, j) for slot j as an int literal — the
    sequence() elements are INT like the batch F.lit(j), and xxhash64 is
    type-sensitive).

    The batch path deliberately avoids the naive nested
    array_min(transform(...))×16 form because projection collapse
    re-inlines the shingle construction once per slot (minhash_docs
    docstring — measured minutes vs seconds). Here the digest array is
    LET-BOUND by lambda-binding it as the single element of an outer
    transform, so it evaluates once per row and the 16 slot-mins iterate
    over the bound variable, not 16 re-inlined copies."""
    from arrow_supercluster_spark.operators.dedup import shingles, tokenize

    digests = F.transform(
        shingles(tokenize(text_col), shingle_k), lambda s: F.xxhash64(s)
    )
    return F.element_at(
        F.transform(
            F.array(digests),
            lambda ds: F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda j: F.array_min(
                    F.transform(ds, lambda d: F.xxhash64(d, j))
                ),
            ),
        ),
        1,
    )


def streaming_neardup_hits(
    docs_stream: DataFrame,
    static_banded: DataFrame,
    static_shingles: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Streaming near-duplicate detection — the E2 (MinHash+LSH)
    streaming twin (VERDICT r4 "Next round" #7): every arriving document
    is checked against a STATIC corpus via the LSH band index, candidates
    verified exactly, all stateless per micro-batch (append mode, no
    watermark — the decontam-stream shape applied to minhash bands).

    Per arriving row: (1) the row computes its own signature
    (minhash_signature_expr — no streaming aggregation), (2) its `bands`
    band hashes explode and equi-join the static band table
    (stream-static join: stateless, the static side is the corpus LSH
    index built ONCE by the batch engine — operators/dedup.minhash_docs →
    banded_signatures), (3) candidate hits join the static shingle-set
    table and are verified with the EXACT n-gram Jaccard — same
    array_intersect/union expression as batch ngram_jaccard_pairs.

    Emits one (stream_id, static_id, jaccard) row per BAND hit (a pair
    sharing k bands appears k times, identical jaccard) — deliberately NOT
    deduplicated in the stream: `dropDuplicates` on a stream is a
    STATEFUL operator whose pair-key state grows without bound, so the
    distinct belongs in the per-micro-batch finisher (the counts-stream /
    finisher split of streaming_contamination_hits above). Self-hits are
    dropped.

    Scale: the static band index and shingle table are corpus-sized —
    the joins hash-partition stream batches against them exactly like the
    batch self-join; nothing is collected, no state store grows with the
    corpus. At 100 TB the static side lives as bucketed tables keyed by
    (band_idx, band_hash) / id so every micro-batch join is co-located."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    from arrow_supercluster_spark.operators.dedup import shingles, tokenize

    rows_per_band = num_hashes // bands
    sig = docs_stream.select(
        F.col(key).alias("stream_id"),
        minhash_signature_expr(F.col(text), num_hashes, shingle_k).alias(
            "signature"
        ),
        F.array_distinct(shingles(tokenize(F.col(text)), shingle_k)).alias(
            "stream_sh"
        ),
    ).filter(F.size("stream_sh") > 0)  # batch drops shingle-less docs too
    banded = sig.select(
        "stream_id",
        "stream_sh",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at(
                                "signature", b * rows_per_band + r + 1
                            )
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    cand = (
        banded.join(static_banded, ["band_idx", "band_hash"])
        .filter(F.col("static_id") != F.col("stream_id"))
        .select("stream_id", "static_id", "stream_sh")
    )
    inter = F.size(F.array_intersect("stream_sh", "static_sh"))
    union = F.size(F.array_union("stream_sh", "static_sh"))
    return cand.join(static_shingles, "static_id").select(
        "stream_id",
        "static_id",
        (inter / union.cast("double")).alias("jaccard"),
    )


def neardup_static_index(
    docs: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
):
    """Batch-built static side for streaming_neardup_hits: the corpus LSH
    band index (static_id, band_idx, band_hash) and exact shingle sets
    (static_id, static_sh) — computed once by the batch engine, reused by
    every micro-batch."""
    from arrow_supercluster_spark.operators.dedup import (
        banded_signatures,
        minhash_docs,
        shingles,
        tokenize,
    )

    sigs = minhash_docs(docs, text, key, num_hashes, shingle_k)
    static_banded = banded_signatures(sigs, key, num_hashes, bands).select(
        F.col(key).alias("static_id"), "band_idx", "band_hash"
    )
    static_shingles = docs.select(
        F.col(key).alias("static_id"),
        F.array_distinct(shingles(tokenize(F.col(text)), shingle_k)).alias(
            "static_sh"
        ),
    )
    return static_banded, static_shingles
