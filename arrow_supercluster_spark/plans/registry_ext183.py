"""Round-7 registry additions, batch 178 — ingestion-format breadth
(the source/sink family, continued): schema evolution and
partition-pruned readback (CSV fidelity already ships as the ext10
q_csv_roundtrip).

- q_schema_evolution: two parquet batches with DIFFERENT schemas
  (the late batch adds n_chars — the "new feature lands mid-crawl"
  event), read together with mergeSchema; per-source row counts and
  null accounting for the late column.  The oracle derives the same
  accounting from the construction rule.
- q_partition_prune_readback: events written `partitionBy(event_type)`
  (the layout a 100 TB event store actually uses), read back with a
  single-type filter that must prune to ONE partition directory —
  per-day counts for that type.  tests assert the readback scan
  carries the partition filter, so the pruning is structural, not
  hoped-for.

At 100 TB: both are write-once/read-once with the work in the
distributed scan (the partitioned write shuffles nothing — parquet
files land under their partition directory); temp outputs go to
per-sf fixed paths with overwrite so repeated runs don't accumulate
(the q_hll_stream r6 lesson).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.sources.tables import read_events


def _scratch(tag: str, sf_dir: str) -> str:
    """Fixed per-(tag, sf) scratch path + overwrite mode = bounded
    accumulation across repeated bench/correctness sweeps."""
    key = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), f"ascs_{tag}_{key}")


# ===========================================================================
# R535 — parquet schema evolution (mergeSchema)
# ===========================================================================

@register(
    "q_schema_evolution",
    """
    WITH merged AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n_chars IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_chars,
           CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS sum_chars
    FROM merged GROUP BY source ORDER BY source
    """,
)
def q_schema_evolution(spark, sf_dir):
    """R535 — mergeSchema over two parquet batches whose schemas
    differ: the even-doc batch ships (doc_id, source), the odd-doc
    batch adds n_chars — the mid-crawl schema-evolution event.  The
    merged read must surface the late column as null for the early
    batch; the oracle derives the identical accounting from the
    construction rule, so a mergeSchema regression (column dropped,
    nulls miscounted) breaks the hash."""
    root = _scratch("schema_evo", sf_dir)
    docs = _docs(spark, sf_dir)
    docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source"
    ).write.mode("overwrite").parquet(f"{root}/batch=1")
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "source", "n_chars"
    ).write.mode("overwrite").parquet(f"{root}/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(
        f"{root}/batch=1", f"{root}/batch=2"
    )
    return (
        merged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("n_chars").isNotNull(), 1).otherwise(0)
            ).alias("n_with_chars"),
            F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias(
                "sum_chars"
            ),
        )
        .orderBy("source")
    )


# ===========================================================================
# R536 — partition-pruned readback
# ===========================================================================

_PPR_TYPE = "purchase"


@register(
    "q_partition_prune_readback",
    f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(SUM(value), 2) AS total_value
    FROM events WHERE event_type = '{_PPR_TYPE}'
    GROUP BY 1 ORDER BY 1
    """,
)
def q_partition_prune_readback(spark, sf_dir):
    """R536 — hive-partitioned event-store layout: events write
    `partitionBy(event_type)` (no shuffle — files land under their
    partition directory), then a single-type readback that MUST prune
    to one directory.  tests/test_batch178.py asserts the readback
    scan's PartitionFilters carries the event_type predicate — the
    structural property that makes a 100 TB type-sliced query touch
    1/|types| of the store."""
    root = _scratch("ppr", sf_dir)
    ev = read_events(spark, sf_dir)
    (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(root)
    )
    back = spark.read.parquet(root).filter(
        F.col("event_type") == _PPR_TYPE
    )
    return (
        back.groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("day")
    )
