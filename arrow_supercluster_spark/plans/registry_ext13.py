"""Round-2 registry additions, batch 6: ORC source/sink (format matrix),
time-series resample + forward-fill, rolling window aggregates, and
schema-projected JSON parsing (from_json vs per-field extraction).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_orc_roundtrip",
    """
    SELECT event_id, user_id, event_type, value, props,
           epoch_us(ts) AS ts_us
    FROM events
    """,
)
def q_orc_roundtrip(spark, sf_dir):
    """S2 companion — ORC source/sink round-trip, completing the format
    matrix (parquet, Arrow IPC, GeoParquet, JSONL, CSV, ORC). ORC is the
    other columnar lakehouse format Spark ships natively (vectorized
    reader, predicate pushdown, zlib/zstd); timestamps ride as
    epoch-microsecond longs so the check is writer-timezone-proof. The
    oracle reads the parquet original — value equality proves the
    round-trip lossless."""
    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "props",
        F.unix_micros("ts").alias("ts_us"),
    )
    path = tempfile.mkdtemp(prefix="orc_rt_") + "/events"
    ev.write.mode("overwrite").option("compression", "zstd").orc(path)
    return spark.read.schema(ev.schema).orc(path)


@register(
    "q_resample_ffill",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             round(AVG(value), 6) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
      FROM bounds
    )
    SELECT g.user_id, epoch_us(g.h) // 1000000 AS h_ts,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
    FROM grid g LEFT JOIN hourly USING (user_id, h)
    """,
)
def q_resample_ffill(spark, sf_dir):
    """Time-series — resample to an hourly grid per user and
    forward-fill gaps (the feature-engineering primitive behind every
    metrics/training-signal join): per-user hourly means, a
    sequence-generated dense grid between each user's first and last
    hour, left-join, then last(ignorenulls) over the per-user window.
    The grid generator is narrow (sequence+explode); the ffill window
    partitions by user — bounded by one user's time range, not the
    corpus. At 100 TB you'd range-partition (user, month) and carry the
    last value across bucket boundaries with a second tiny join; the
    per-bucket kernel is exactly this plan."""
    ev = read_events(spark, sf_dir)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.unix_timestamp("h").alias("h_ts"),
            F.last("v", ignorenulls=True).over(w).alias("v_fill"),
        )
    )


@register(
    "q_rolling_avg",
    """
    SELECT event_id,
           round(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7
    FROM events
    """,
)
def q_rolling_avg(spark, sf_dir):
    """Time-series — 7-event moving average per user (trend smoothing /
    anomaly baselines). A frame-bounded window: Spark keeps a running
    frame, no per-row rescan; the partition key is user_id so skew is
    bounded by one user's event count. Ordered by (ts, event_id) —
    timestamps alone could tie and make the frame engine-dependent.
    Averages rounded before hashing (windowed double sums are
    order-dependent only across engines' summation, same frame rows)."""
    ev = read_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id", F.round(F.avg("value").over(w), 6).alias("ma7")
    )


@register(
    "q_json_schema_parse",
    """
    SELECT event_type,
           COUNT(k) AS n_k,
           SUM(k) AS sum_k,
           round(AVG(k), 6) AS avg_k
    FROM (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    ) t GROUP BY event_type
    """,
)
def q_json_schema_parse(spark, sf_dir):
    """E5 companion — schema-projected JSON parsing: from_json with an
    explicit schema parses each props string ONCE into a typed struct
    (the scalable path — per-field get_json_object re-parses the string
    per field; q_json_extract checks that form). Parse failures become
    nulls, flowing through COUNT(k) as the data-quality signal. One
    narrow parse projection + one tiny agg."""
    ev = read_events(spark, sf_dir)
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_k"),
        F.sum("k").alias("sum_k"),
        F.round(F.avg("k"), 6).alias("avg_k"),
    )


@register(
    "q_json_corrupt_audit",
    """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(*) FILTER (NOT ok) AS n_corrupt,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM (
      SELECT event_type,
             json_valid(p) AS ok,
             CASE WHEN json_valid(p)
                  THEN CAST(json_extract_string(p, '$.k') AS INTEGER)
             END AS k
      FROM (
        SELECT event_type,
               CASE WHEN event_id % 13 = 0
                    THEN substr(props, 1, length(props) - 1)
                    ELSE props END AS p
        FROM events
      ) raw
    ) t GROUP BY event_type
    """,
)
def q_json_corrupt_audit(spark, sf_dir):
    """E5 companion — corrupt-record auditing: 1/13th of the props
    strings are truncated (synthetic corruption, deterministic by id),
    then parsed in PERMISSIVE mode — failures become nulls and are
    COUNTED per group instead of killing the job (the operational
    posture for 100 TB of scraped JSON: quarantine-and-count, never
    fail the pipeline). Spark detects corruption via from_json null-out;
    the oracle via json_valid — differentially checking the detection
    itself. sum_k proves good records still aggregate."""
    ev = read_events(spark, sf_dir)
    p = F.when(
        F.col("event_id") % 13 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    # PERMISSIVE from_json yields an all-null-fields struct (not a null
    # struct) on malformed input — field nullity IS the corruption signal
    # (every well-formed props has k in this corpus)
    parsed = ev.select(
        "event_type",
        F.from_json(p, "k INT").alias("s"),
    ).select("event_type", F.col("s.k").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("k").isNull().cast("long")).alias("n_corrupt"),
        F.sum("k").alias("sum_k"),
    )
