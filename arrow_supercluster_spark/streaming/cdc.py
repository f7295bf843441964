"""Streaming CDC apply — the bronze→silver lakehouse pattern.

A change-data-capture log (upserts + deletes, each stamped with a
(ts, seq) total order) arrives in micro-batches; the job maintains the
MATERIALIZED table state across batches and, at the end, emits final
rows (live upserts only). The merge rule is a per-key ARGMAX over
(ts, seq) with deletes kept as tombstones until the end — an
associative, commutative merge, so the result is independent of how
ops are split into micro-batches and of arrival order ACROSS batches
(the property tests/test_batch120.py pins by replaying the same log in
a different file split).

State is a DataFrame folded in foreachBatch (the maintain_hierarchy
shape from streaming/events.py): each batch pre-aggregates to one row
per key (argmax + op count), unions with the running state, and
re-aggregates; localCheckpoint truncates the lineage so state never
re-reads old batches. At scale the state frame is one row per live
entity — the same footprint as the silver table it maintains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_ops(orders: DataFrame) -> DataFrame:
    """The deterministic op log shared with the batch twin
    (plans/registry_ext92.q_cdc_apply): orderkey % 10 ≥ 8 ⇒ delete,
    else upsert; order by (o_orderdate, o_orderkey)."""
    return orders.select(
        F.col("o_custkey").alias("k"),
        F.when(F.col("o_orderkey") % 10 >= 8, "D").otherwise("U").alias("op"),
        F.col("o_totalprice").alias("val"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
    )


def _compact(ops: DataFrame) -> DataFrame:
    """One row per key: the (ts, seq)-argmax op + the op count."""
    return ops.groupBy("k").agg(
        F.max_by(
            F.struct("op", "val", "ts", "seq"), F.struct("ts", "seq")
        ).alias("best"),
        F.sum(F.coalesce(F.col("n_ops"), F.lit(1))).alias("n_ops")
        if "n_ops" in ops.columns
        else F.count(F.lit(1)).alias("n_ops"),
    ).select(
        "k",
        F.col("best.op").alias("op"),
        F.col("best.val").alias("val"),
        F.col("best.ts").alias("ts"),
        F.col("best.seq").alias("seq"),
        "n_ops",
    )


def fold_cdc_batch(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Merge a micro-batch into the running state. Associative and
    commutative: state ∪ batch → per-key argmax + summed op counts."""
    compact = _compact(batch)
    if state is None:
        merged = compact
    else:
        merged = _compact(state.unionByName(compact))
    # truncate lineage so the fold does not re-plan every prior batch
    return merged.localCheckpoint(eager=True)


def finish_cdc_state(state: DataFrame) -> DataFrame:
    """Final silver rows: live upserts only, batch-twin column shape."""
    return state.filter(F.col("op") == "U").select(
        F.col("k").alias("custkey"),
        F.round("val", 2).alias("last_value"),
        F.col("ts").alias("last_ts"),
        "n_ops",
    )
