"""Small-file compaction — the table-maintenance operator every long-
running ingest needs: micro-batch/streaming sinks leave thousands of
KB-sized parquet files, and at 100 TB the resulting task-per-file
scheduling + footer-read overhead dominates scan time.

Compaction = read → `coalesce(ceil(total_bytes / target))` → rewrite.
`coalesce` (not `repartition`): it merges existing partitions WITHOUT a
shuffle — each output task streams several input files; the write is the
only cost. Sizing from the actual on-disk bytes keeps output files near
the target regardless of row width.
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import SparkSession


def _local_size(uri: str) -> int:
    p = urlparse(uri)
    return os.path.getsize(unquote(p.path))


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 << 20,
) -> int:
    """Rewrites `in_path` into ~target_bytes files at `out_path`;
    returns the output file count."""
    df = spark.read.parquet(in_path)
    total = sum(_local_size(f) for f in df.inputFiles())
    n = max(1, math.ceil(total / target_bytes))
    df.coalesce(n).write.mode("overwrite").parquet(out_path)
    return len(
        [
            f
            for f in os.listdir(out_path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
    )
