"""SparkSession builder with the engine's scale-tuned defaults.

Every knob is set for the reasons below — on a real cluster only
`shuffle_partitions` (≈ 2-3× total cores) and memory sizing change; the
semantics-affecting settings (timezone, AQE) must stay.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(
    master: str = "local[32]",
    shuffle_partitions: int = 32,
    app_name: str = "arrow-supercluster-spark",
) -> SparkSession:
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        # deterministic cross-engine timestamp semantics (oracle parity)
        .config("spark.sql.session.timeZone", "UTC")
        # runtime re-planning: partition coalescing after filters, skew-join
        # splitting for hot keys, broadcast-join promotion by actual size
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # shuffle width ≈ cores at test scale; 2-3× total cores on a cluster
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # split large scans so a partition fits executor memory at 100 TB
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # Arrow exchange for all pandas/arrow kernels and collects
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # events.parquet ships INT64 TIMESTAMP(NANOS)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str, engine=None) -> None:
    """Expose the engine surface to plain `spark.sql()`: every testdata
    table becomes a temp view (events through the timestamp-normalizing
    reader), and, when an engine is given, its materialized hierarchy is
    published as `cluster_hierarchy` — so a SQL-only consumer can run
    the same queries the DataFrame API expresses (views are lazy; no
    data is copied)."""
    from arrow_supercluster_spark.sources.tables import read_events

    for t in TABLES:
        df = (
            read_events(spark, sf_dir)
            if t == "events"
            else spark.read.parquet(f"{sf_dir}/{t}.parquet")
        )
        df.createOrReplaceTempView(t)
    if engine is not None:
        engine._require().createOrReplaceTempView("cluster_hierarchy")
