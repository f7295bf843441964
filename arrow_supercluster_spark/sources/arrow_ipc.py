"""Arrow IPC source/sink (SURVEY.md §2a S2).

The reference's wire format is Arrow IPC (tableToIPC/tableFromIPC,
benchmarks/pipeline.ts:100-156 — 84% smaller than GeoJSON). Spark 4's
native `df.toArrow()` / `createDataFrame(pa.Table)` cover the driver
boundary zero-copy-ish; `mapInArrow` keeps executor-side batch transforms
in Arrow format without pandas conversion.

Scale note: the driver-side IPC path is for the rendering boundary only
(BASELINE.json: "web rendering is external"); bulk data never funnels
through the driver — executor-side Arrow batches (mapInArrow) are the
100 TB path.
"""

from __future__ import annotations

import io
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession


def to_ipc_bytes(df: DataFrame) -> bytes:
    """DataFrame → Arrow IPC stream bytes (the reference's tableToIPC)."""
    tbl = df.toArrow()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue()


def from_ipc_bytes(spark: SparkSession, buf: bytes) -> DataFrame:
    """Arrow IPC stream bytes → DataFrame (the reference's tableFromIPC)."""
    with pa.ipc.open_stream(io.BytesIO(buf)) as r:
        tbl = r.read_all()
    return spark.createDataFrame(tbl)


def map_arrow_identity(df: DataFrame) -> DataFrame:
    """Executor-side Arrow batch pass-through — the plumbing hook for
    Arrow-native batch transforms (no pandas materialization)."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        yield from batches

    return df.mapInArrow(fn, schema=df.schema)
