"""Round-5 registry additions, batch 99 — streaming near-duplicate
detection (VERDICT r4 "Next round" #7):

- q_neardup_stream: the Structured Streaming twin of batch E2
  (MinHash+LSH near-dup): documents arrive through a file stream, each
  row computes its OWN signature statelessly (let-bound HOF expression,
  streaming/dedup.minhash_signature_expr), its band hashes join the
  STATIC corpus LSH index (stream-static, stateless — the
  decontam-stream shape applied to minhash bands), and candidates are
  verified with the exact n-gram Jaccard per micro-batch. Rows-only by
  design — a stream-static availableNow run has no SQL form; the pair
  set's equality with the batch engine (lsh_candidate_pairs +
  ngram_jaccard_pairs) is asserted in tests/test_streaming_dedup.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_table


@register("q_neardup_stream", None)
def q_neardup_stream(spark, sf_dir):
    """E2 streaming twin — static corpus = the exact-deduped documents
    table (matching batch lsh_candidate_pairs' pre_dedup), stream = the
    same deduped docs through a file stream (availableNow, append to a
    memory sink). The finisher collapses band-level duplicate hits and
    the two stream directions of each pair to distinct unordered
    (a_id, b_id, jaccard) rows — the batch pair shape."""
    from arrow_supercluster_spark.operators.dedup import exact_dedup
    from arrow_supercluster_spark.streaming.dedup import (
        neardup_static_index,
        streaming_neardup_hits,
    )

    docs = exact_dedup(read_table(spark, sf_dir, "documents"))
    static_banded, static_shingles = neardup_static_index(docs)
    src = tempfile.mkdtemp(prefix="neardup_stream_src_")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    name = "neardup_stream_sink"
    q = (
        streaming_neardup_hits(stream, static_banded, static_shingles)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(name)
        .select(
            F.least("stream_id", "static_id").alias("a_id"),
            F.greatest("stream_id", "static_id").alias("b_id"),
            F.round("jaccard", 9).alias("jaccard"),
        )
        .distinct()
    )
