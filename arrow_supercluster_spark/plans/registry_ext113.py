"""Round-5 registry additions, batch 108 — the partition-skew
diagnostic (market-basket rules were drafted here too, but the
duplicate-registration guard caught that q_assoc_rules already ships in
registry_ext31 with an Apriori prune — kept the original):

- q_partition_skew: the diagnostic every shuffle-tuning session starts
  with — per-bucket row/byte counts under two candidate partitionings
  (hash-mod on the key vs the natural `source` dimension), rolled up to
  (scheme, n_buckets, max/mean rows, skew factor). A skew factor ≫ 1 on
  the natural dimension is the signal to salt (q_salted_join) or let
  AQE split.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs

_SKEW_BUCKETS = 32


@register(
    "q_partition_skew",
    f"""
    WITH by_hash AS (
      SELECT doc_id % {_SKEW_BUCKETS} AS bucket,
             COUNT(*) AS n, SUM(n_chars) AS bytes
      FROM documents GROUP BY 1
    ),
    by_source AS (
      SELECT source AS bucket_name, COUNT(*) AS n, SUM(n_chars) AS bytes
      FROM documents GROUP BY 1
    )
    SELECT 'hash_mod' AS scheme,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           round(AVG(n), 4) AS mean_rows,
           round(MAX(n) / AVG(n), 4) AS skew_factor,
           CAST(MAX(bytes) AS BIGINT) AS max_bytes
    FROM by_hash
    UNION ALL
    SELECT 'source',
           CAST(COUNT(*) AS BIGINT),
           CAST(MAX(n) AS BIGINT),
           round(AVG(n), 4),
           round(MAX(n) / AVG(n), 4),
           CAST(MAX(bytes) AS BIGINT)
    FROM by_source
    """,
)
def q_partition_skew(spark, sf_dir):
    """Partition-skew report under two candidate partitionings of the
    corpus — hash-mod({b}) on the key vs the natural `source` dimension:
    bucket row/byte extremes, mean, and the max/mean skew factor. The
    number a shuffle-tuning session reads first: skew ≫ 1 on the
    dimension you're about to join/group on means salting
    (q_salted_join) or AQE skew-split; ≈ 1 on hash-mod confirms the key
    itself is fine. Two keyed aggs + two 1-row rollups.""".format(
        b=_SKEW_BUCKETS
    )
    docs = _docs(spark, sf_dir)
    by_hash = docs.groupBy(
        F.pmod("doc_id", F.lit(_SKEW_BUCKETS)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("bytes"))
    by_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("bytes")
    )

    def rollup(df, scheme):
        return df.agg(
            F.lit(scheme).alias("scheme"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_rows"),
            F.round(F.avg("n"), 4).alias("mean_rows"),
            F.round(F.max("n") / F.avg("n"), 4).alias("skew_factor"),
            F.max("bytes").alias("max_bytes"),
        ).select(
            "scheme", "n_buckets", "max_rows", "mean_rows", "skew_factor",
            "max_bytes",
        )

    return rollup(by_hash, "hash_mod").unionByName(
        rollup(by_source, "source")
    )
