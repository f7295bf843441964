"""Streaming sketch maintenance: keep a count-min sketch current over
an unbounded stream by writing one fixed-size partial sketch per
micro-batch and merging at read time.

Why this shape scales: the CMS is MERGEABLE (counter sum), so the
stream never needs global state — each micro-batch contributes a
(d x width)-bounded partial, the sink grows by at most d*width rows
per batch regardless of batch size, and the merged view is one small
aggregation over the partials (compacting old partials into one is the
same aggregation written back). Idempotent under foreachBatch's
at-least-once replay: each batch overwrites its OWN batch_id=...
subdirectory, so a replayed batch replaces rather than double-counts —
the same durable-marker discipline as streaming/events.maintain_hierarchy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from arrow_supercluster_spark.operators import cms


def maintain_cms(
    doc_stream: DataFrame,
    path: str,
    col: str = "tok",
    width: int = 2048,
    depth: int = 4,
):
    """writeStream query: per-batch CMS partials under
    `{path}/batch_id=N/`. Pass a streaming DataFrame with a token
    column `col`."""

    def _fold(batch_df, batch_id: int) -> None:
        sketch = cms.cms_build(batch_df, col, width=width, depth=depth)
        sketch.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return doc_stream.writeStream.foreachBatch(_fold).outputMode("append")


def read_cms(spark, path: str) -> DataFrame:
    """The merged sketch: counter sum over all per-batch partials."""
    return (
        spark.read.parquet(f"{path}/batch_id=*")
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )
