"""Round-2 registry additions, batch 30 — file-based media ingestion and
the trending-top-k batch twin:

- q_binary_ingest: REAL file ingestion — BMP files written to a
  directory, read back through Spark's binaryFile source, decoded to
  features (rows-only; parity vs the in-flight path in tests);
- q_trending_topk: top-3 event types per hour — the batch twin of the
  streaming trending pipeline (streaming/events.trending_counts +
  finish_trending_topk; streaming ≡ batch asserted in
  tests/test_batch30.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import multimodal as mm
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.streaming.events import finish_trending_topk
from arrow_supercluster_spark.sources.tables import read_events


@register("q_binary_ingest", None)
def q_binary_ingest(spark, sf_dir):
    """Multimodal — end-to-end FILE ingestion: one real .bmp per
    document written executor-side, read back via the binaryFile source
    (whole-file binary column, parallelism = files, path/length
    metadata pushdown), decoded to pixel features. This is the shape
    media actually arrives in — the in-flight synthesized tables
    (documents_as_images) are its unit-test twin. Rows-only; equality
    with the in-flight decode path asserted in tests/test_batch30.py."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = tempfile.mkdtemp(prefix="media_ingest_") + "/bmp"
    mm.write_media_files(docs, path)
    media = mm.read_media_files(spark, path)
    return mm.image_features(media)


@register(
    "q_trending_topk",
    """
    WITH counts AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
             event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT hour, event_type, n, rk FROM (
      SELECT hour, event_type, n,
             ROW_NUMBER() OVER (
               PARTITION BY hour ORDER BY n DESC, event_type
             ) AS rk
      FROM counts
    ) WHERE rk <= 3
    """,
)
def q_trending_topk(spark, sf_dir):
    """E6 — trending event types: top-3 per hour (count desc, type asc).
    This is the BATCH twin of the streaming pipeline
    (streaming/events.trending_counts — watermarked mergeable counts —
    plus finish_trending_topk): ranking cannot run incrementally on an
    unbounded stream, so the streaming job maintains only counts and
    the finisher ranks per emitted window; streaming ≡ batch is
    asserted in tests/test_batch30.py. The rank window partitions by
    hour (bounded by |types| rows per partition)."""
    ev = read_events(spark, sf_dir)
    counts = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    return finish_trending_topk(counts, k=3)
