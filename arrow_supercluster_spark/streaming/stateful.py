"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY mandate: "applyInPandasWithState for custom stateful operators").

`streaming_dedup` — exactly-once-per-key emission over an unbounded
stream: the state per key is a single "seen" flag; only the first-arriving
row for each key is emitted. This is the streaming form of exact dedup
(E1) — the batch form groups on the digest; the streaming form cannot
(the group never closes), so per-key state + timeout is the correct tool.

Scale design: state lives in the state store (RocksDB/HDFS-backed on a
real cluster), partitioned by the grouping key — the same hash partitioning
as a batch groupBy, with O(distinct keys) state. A processing-time timeout
expires idle keys so state is bounded for drifting key domains.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


OUT_SCHEMA = "text_hash string, doc_id long, n_seen long"
STATE_SCHEMA = "seen long"


def _dedup_fn(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit the first row ever seen for this key; count suppressed dups in
    state (exposed on each first emission as n_seen=1). On timeout the
    state is REMOVED — re-arming it would resurrect every idle key and
    grow the store O(all keys ever seen) on a drifting key domain."""
    if state.hasTimedOut:
        state.remove()
        return
    seen = state.get[0] if state.exists else 0
    first_doc = None
    batch_count = 0
    for pdf in pdfs:
        batch_count += len(pdf)
        if len(pdf) > 0:
            m = int(pdf["doc_id"].min())
            first_doc = m if first_doc is None else min(first_doc, m)
    state.update((seen + batch_count,))
    state.setTimeoutDuration(3600 * 1000)
    if seen == 0 and first_doc is not None:
        yield pd.DataFrame(
            {"text_hash": [key[0]], "doc_id": [first_doc], "n_seen": [1]}
        )


def streaming_dedup(doc_stream: DataFrame) -> DataFrame:
    """readStream(documents-like) → md5(normalized text) key → stateful
    first-wins dedup. Emits one row per distinct text, on first arrival."""
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.operators.dedup import normalize_text

    keyed = doc_stream.select(
        F.md5(normalize_text(F.col("text"))).alias("text_hash"),
        F.col("doc_id"),
    )
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
