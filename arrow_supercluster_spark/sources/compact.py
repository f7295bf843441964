"""Small-file compaction — the table-maintenance operator every long-
running ingest needs: micro-batch/streaming sinks leave thousands of
KB-sized parquet files, and at 100 TB the resulting task-per-file
scheduling + footer-read overhead dominates scan time.

Compaction = read → `coalesce(ceil(total_bytes / target))` → rewrite.
`coalesce` (not `repartition`): it merges existing partitions WITHOUT a
shuffle — each output task streams several input files; the write is the
only cost. Sizing from the actual on-disk bytes keeps output files near
the target regardless of row width.

File sizing and output listing go through the Hadoop FileSystem API (not
``os.path``), so the same code path works for ``file://``, ``hdfs://``,
``s3a://`` and any other configured filesystem — the 100 TB deployment
target is an object store, not a local disk.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _hadoop_fs(spark: SparkSession, uri: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(uri)
    return jvm, path.getFileSystem(conf), path


def _file_size(spark: SparkSession, uri: str) -> int:
    _, fs, path = _hadoop_fs(spark, uri)
    return fs.getFileStatus(path).getLen()


def _list_parquet_files(spark: SparkSession, dir_uri: str) -> list[str]:
    _, fs, path = _hadoop_fs(spark, dir_uri)
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append(name)
    return out


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 << 20,
) -> int:
    """Rewrites `in_path` into ~target_bytes files at `out_path`;
    returns the output file count."""
    df = spark.read.parquet(in_path)
    total = sum(_file_size(spark, f) for f in df.inputFiles())
    n = max(1, math.ceil(total / target_bytes))
    df.coalesce(n).write.mode("overwrite").parquet(out_path)
    return len(_list_parquet_files(spark, out_path))
