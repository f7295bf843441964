"""Table readers for the driver testdata, handling physical-type quirks.

`events.parquet` stores ts as INT64 TIMESTAMP(NANOS) which Spark's vectorized
reader rejects by default (PARQUET_TYPE_ILLEGAL); we read nanos as long
(legacy conf) and rebuild a proper TimestampType with exact integer division
(ns are ~1.7e18 — beyond double's 2^53 — so no float path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) infers as NTZ; cast to
        # instant semantics (value-preserving under the UTC session) so
        # unix_micros/window functions resolve
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev
