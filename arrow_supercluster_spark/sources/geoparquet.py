"""GeoParquet sink (SURVEY.md §2a S3).

The reference writes Parquet with ZSTD and GeoParquet 1.1.0 `geo` footer
metadata (point encoding + bbox) at
examples/basic/scripts/generate-geoparquet.ts:167-199. Spark's parquet
writer handles the data path (distributed, ZSTD); the `geo` key-value
footer metadata is attached afterwards with pyarrow.

Honest scale caveat: pyarrow's stable API cannot edit a footer in place,
so the metadata pass here re-encodes each part file on the driver — fine
at test scale, wrong at 100 TB. The production shapes are (a) write each
partition with pyarrow inside mapPartitions so the metadata is present at
write time, or (b) a `_metadata` sidecar carrying the geo key — both
O(files); left as the documented path since the testbed has no object
store to exercise them against.
"""

from __future__ import annotations

import glob
import json
import os

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
) -> None:
    """Write points as GeoParquet: geometry as a struct{lng,lat} column
    (GeoArrow point semantics; the reference uses FixedSizeList[2]), ZSTD,
    then stamp the `geo` footer metadata on every part file."""
    import pyarrow.parquet as pq

    bbox_row = df.agg(
        F.min(lng), F.max(lng), F.min(lat), F.max(lat)
    ).collect()[0]
    bbox = [bbox_row[0], bbox_row[2], bbox_row[1], bbox_row[3]]

    out = df.withColumn("geometry", F.struct(F.col(lng), F.col(lat)))
    out.write.mode("overwrite").option("compression", compression).parquet(path)

    geo = json.dumps(geo_metadata(bbox)).encode()
    for part in glob.glob(os.path.join(path, "*.parquet")):
        tbl = pq.read_table(part)
        meta = dict(tbl.schema.metadata or {})
        meta[b"geo"] = geo
        pq.write_table(
            tbl.replace_schema_metadata(meta), part, compression=compression
        )
        # Spark's checksummed local FS keeps .crc sidecars from the original
        # write; the rewrite invalidates them and re-reads would fail
        crc = os.path.join(path, f".{os.path.basename(part)}.crc")
        if os.path.exists(crc):
            os.remove(crc)


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
