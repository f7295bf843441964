"""Lineage truncation for iterative DataFrame algorithms.

`localCheckpoint(eager=True)` cuts the logical plan (preventing the
exponential plan growth every self-referential loop suffers) but COPIES
the child plan's size estimate into the new LogicalRDD
(`LogicalRDD.rewriteStatsAndConstraints`). In a fixpoint loop whose body
joins the checkpointed result with itself, that estimate SQUARES every
iteration — the sizeInBytes BigInt doubles in digit count per round, and
after ~15 rounds Catalyst OOMs inside `BigInteger.multiply` while merely
computing stats. `truncate()` therefore rebuilds the Dataset from the
checkpoint's internal row RDD, resetting leaf stats to the default
estimate: constant-size stats per iteration, identical data, no extra
job (the checkpoint already materialized eagerly), no Python round-trip
(the RDD stays `InternalRow` JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint with leaf-stats reset (see module doc)."""
    ck = df.localCheckpoint(eager=True)
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        jdf = ck._jdf
        new_jdf = ck.sparkSession._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return _CDF(new_jdf, ck.sparkSession)
    except Exception:  # pragma: no cover - private-API guard
        return ck
