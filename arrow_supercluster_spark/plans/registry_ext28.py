"""Round-2 registry additions, batch 23 — training-data packing, data
completeness, and table maintenance:

- q_concat_chunks: GPT-style concat-and-chunk sequence packing — every
  document's global token offset via a DISTRIBUTED two-phase prefix sum
  (functions/prefix.py), then fixed 512-token training-bin spans;
- q_calendar_gaps: missing (event_type, hour) detection over the dense
  calendar grid — the data-completeness audit;
- q_compact_files: small-file compaction round-trip (coalesce-based, no
  shuffle) with content equality proven against the source table.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.functions.prefix import global_prefix_sum
from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.compact import compact_parquet
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Concat-and-chunk packing
# ===========================================================================

_CHUNK = 512


@register(
    "q_concat_chunks",
    f"""
    WITH t AS (
      SELECT doc_id, CAST(len({SQL_TOKS}) AS BIGINT) AS n_toks FROM documents
    ),
    c AS (
      SELECT doc_id, n_toks,
             CAST(coalesce(SUM(n_toks) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS off
      FROM t
    )
    SELECT doc_id, n_toks, off,
           off // {_CHUNK} AS first_bin,
           CASE WHEN n_toks > 0 THEN (off + n_toks - 1) // {_CHUNK}
                ELSE off // {_CHUNK} END AS last_bin,
           CASE WHEN n_toks > 0 THEN (off + n_toks - 1) // {_CHUNK}
                ELSE off // {_CHUNK} END - off // {_CHUNK} + 1 AS n_bins
    FROM c
    """,
)
def q_concat_chunks(spark, sf_dir):
    """Pipeline — concat-and-chunk sequence packing (the standard LLM
    pretraining batcher: concatenate the token stream in doc_id order,
    cut every {c} tokens): per document, its global token offset and the
    training-bin span it lands in (n_bins > 1 ⇒ the doc straddles a cut).
    The offset is an EXCLUSIVE global prefix sum computed scale-safely
    (functions/prefix.py): one range shuffle, per-partition running sums
    (window partitioned by the physical partition — no single-reducer
    ORDER BY window), per-partition totals prefix-summed on the driver
    (|partitions| rows) and broadcast back. The oracle uses the naive
    unpartitioned window — fine for DuckDB, the anti-pattern the Spark
    side exists to avoid.""".format(c=_CHUNK)
    docs = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_toks")
    )
    c = global_prefix_sum(t, "doc_id", "n_toks", out="off")
    first_bin = F.expr(f"off div {_CHUNK}")
    last_bin = F.when(
        F.col("n_toks") > 0, F.expr(f"(off + n_toks - 1) div {_CHUNK}")
    ).otherwise(first_bin)
    return c.select(
        "doc_id",
        "n_toks",
        "off",
        first_bin.alias("first_bin"),
        last_bin.alias("last_bin"),
        (last_bin - first_bin + 1).alias("n_bins"),
    )


# ===========================================================================
# Calendar gaps
# ===========================================================================

@register(
    "q_calendar_gaps",
    """
    WITH obs AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS h FROM events
    ),
    b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM obs),
    grid AS (
      SELECT et.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN b
      CROSS JOIN unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS g(h)
    )
    SELECT grid.event_type, epoch_us(grid.h) AS hour_us
    FROM grid LEFT JOIN obs
      ON obs.event_type = grid.event_type AND obs.h = grid.h
    WHERE obs.h IS NULL
    """,
)
def q_calendar_gaps(spark, sf_dir):
    """Data quality — calendar completeness: (event_type, hour) cells
    with ZERO events between the global first and last observed hour —
    the missing-data audit behind every ingestion SLA. The observed set
    collapses to |types|×|hours| distinct keys first (one agg over keys
    only), the dense grid is generated from a 1-row bounds agg
    (sequence + explode — no driver loop), and the gap set is a
    left-anti join between two tiny keyed tables; the fact table is
    scanned once and never shuffled wide."""
    ev = read_events(spark, sf_dir)
    obs = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).distinct()
    bounds = obs.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    return (
        grid.join(obs, ["event_type", "h"], "left_anti")
        .select("event_type", F.unix_micros("h").alias("hour_us"))
    )


# ===========================================================================
# Small-file compaction
# ===========================================================================

_COMPACT_TARGET = 1 << 20  # 1 MiB targets keep the sf0.01 fixture multi-file


@register(
    "q_compact_files",
    """
    SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
    FROM events
    """,
)
def q_compact_files(spark, sf_dir):
    """Maintenance — small-file compaction: fragment events into 24
    micro-files (the streaming-sink pathology), compact with
    sources/compact.compact_parquet — `coalesce(ceil(bytes/target))`,
    which merges partitions WITHOUT a shuffle — and return the compacted
    table's content, proven identical to the source against the oracle.
    File-count and no-shuffle assertions live in tests/test_batch23.py.
    At 100 TB this is the nightly table-maintenance job; the only cost
    is the rewrite itself."""
    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    )
    base = tempfile.mkdtemp(prefix="compact_")
    small, out = f"{base}/small", f"{base}/compacted"
    ev.repartition(24).write.mode("overwrite").parquet(small)
    compact_parquet(spark, small, out, target_bytes=_COMPACT_TARGET)
    return spark.read.parquet(out)
