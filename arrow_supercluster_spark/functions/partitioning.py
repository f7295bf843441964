"""Input-parallelism guard for heavy narrow maps.

A corpus that arrives as one file (the test datasets) scans as ONE
partition, serializing per-doc compute (tokenize/shingle/hash) on a
single core; but a 100 TB corpus arrives as thousands of well-sized
splits, and an unconditional repartition there is a gratuitous full-data
shuffle. `spread()` repartitions only when the input is genuinely
under-parallel, so the plan is unchanged for already-partitioned input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition to defaultParallelism ONLY if the input has fewer
    partitions than that — i.e., the scan can't keep every core busy.
    `df.rdd.getNumPartitions()` plans but runs no job."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
