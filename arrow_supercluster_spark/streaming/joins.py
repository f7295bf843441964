"""Stream-stream interval joins over the events stream.

The reference engine has no streaming surface (SURVEY §2a closing note);
this extends the E6 streaming column (tumbling windows, sessionization,
stateful dedup) with the remaining Structured Streaming primitive: a
stream-stream equi-join with an event-time range condition — the
streaming twin of q_view_purchase_attribution's batch join
(plans/registry_ext17.py).

Scale shape: both sides carry watermarks, so the join state Spark keeps
per key is bounded by the lookback window (24 h of views per user, 1 h
of purchases), evicted as the watermark advances — the state never
grows with stream length. The join itself is the same user-keyed
hash join as the batch form; the time bound is the residual predicate
that drives state eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ATTR_WINDOW_HOURS = 24


def attribution_pairs(events_stream: DataFrame) -> DataFrame:
    """(purchase_id, user_id, view_id, v_us) — every view by the same
    user within the 24 h lookback of each purchase (the pre-aggregation
    pair set; the last-touch pick is a downstream batch agg, see
    q_view_purchase_attribution).

    `events_stream` is a streaming DataFrame with (event_id, user_id,
    event_type, ts: timestamp). Self-join of two filtered branches;
    watermarks: 1 h on the purchase side, window + 1 h on the view side
    (the view watermark must trail far enough that a view is still in
    state when its last eligible purchase arrives)."""
    p = (
        events_stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    v = (
        events_stream.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", f"{ATTR_WINDOW_HOURS + 1} hours")
    )
    joined = p.join(
        v,
        F.expr(
            "v_user = user_id AND v_ts <= p_ts "
            f"AND v_ts >= p_ts - interval {ATTR_WINDOW_HOURS} hours"
        ),
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "view_id",
        F.unix_micros("v_ts").alias("v_us"),
    )
