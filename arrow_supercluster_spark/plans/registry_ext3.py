"""Registry entries: as-of join, IVF ANN, skew-safe aggregation, Arrow IPC
round-trip — scale-path operators beyond the reference surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import similarity
from arrow_supercluster_spark.operators.asof import asof_join
from arrow_supercluster_spark.functions.skew import salted_count_sum
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS_NONULL
from arrow_supercluster_spark.sources.tables import read_events


# ===========================================================================
# As-of join: each event ← latest order of the same key at or before ts
# ===========================================================================

@register(
    "q_asof_join",
    """
    WITH o1 AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                     ORDER BY o_orderkey DESC) AS rn
        FROM orders
      ) t WHERE rn = 1
    )
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           o.o_orderkey, o.o_totalprice
    FROM events e
    ASOF LEFT JOIN o1 o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_asof_join(spark, sf_dir):
    """As-of join via union + last_value(ignorenulls) window — ONE shuffle
    on the key, no range-join explosion (operators/asof.py). Oracle:
    DuckDB's native ASOF JOIN. The right side is first deduplicated to one
    row per (key, time) — max orderkey wins — because an as-of match among
    equal timestamps is otherwise implementation-defined in BOTH engines."""
    from pyspark.sql.window import Window

    ev = read_events(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    o1 = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts"),
        o1.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "o_orderkey",
        "o_totalprice",
    )


# ===========================================================================
# IVF approximate nearest neighbors (rows-only: k-means is iterative)
# ===========================================================================

@register("q_ann_ivf", None)
def q_ann_ivf(spark, sf_dir):
    """E3 scale path — IVF: k-means coarse quantizer (pyspark.ml, fixed
    seed), queries probe nprobe nearest lists, exact cosine within probed
    lists only. Rows-only (iterative algorithm — SURVEY's non-SQL class);
    recall vs brute force asserted in tests/test_similarity.py.  Sized by
    the shared √n rule (similarity.ivf_n_lists, VERDICT r8 "Next round"
    #5) — no pinned list count, so the entry keeps the n^1.5 IVF-flat
    curve at any corpus size."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return similarity.ivf_topk(corpus, queries, k=5)


# ===========================================================================
# Skew-safe aggregation (exact ⇒ oracle = plain GROUP BY)
# ===========================================================================

@register(
    "q_skew_agg",
    """
    SELECT l_returnflag, COUNT(*) AS n,
           round(SUM(l_extendedprice), 2) AS sum_l_extendedprice,
           round(SUM(l_quantity), 2) AS sum_l_quantity
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_skew_agg(spark, sf_dir):
    """Salted two-stage aggregation (functions/skew.py): the hot group key
    fans out over 16 salt reducers before the final re-aggregate. Exactly
    equal to the plain GROUP BY (the oracle) — that equality IS the test."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = salted_count_sum(
        li,
        group_cols=["l_returnflag"],
        sum_cols=["l_extendedprice", "l_quantity"],
        salt_cols=["l_orderkey", "l_linenumber"],
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("sum_l_extendedprice", 2).alias("sum_l_extendedprice"),
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
    )


# ===========================================================================
# S2 — Arrow IPC round-trip (driver boundary)
# ===========================================================================

@register(
    "q_arrow_ipc_roundtrip",
    f"SELECT id, lng, lat FROM ({SQL_POINTS_NONULL}) WHERE id % 10 = 0",
)
def q_arrow_ipc_roundtrip(spark, sf_dir):
    """S2 — Arrow IPC wire format (tableToIPC/tableFromIPC,
    benchmarks/pipeline.ts:100-156): DataFrame → IPC stream bytes → back,
    plus an executor-side mapInArrow pass-through. Doubles survive
    bit-exactly ⇒ oracle-checkable against the source expression."""
    from arrow_supercluster_spark.sources.arrow_ipc import (
        from_ipc_bytes,
        map_arrow_identity,
        to_ipc_bytes,
    )
    from arrow_supercluster_spark.sources.points import derived_points

    pts = (
        derived_points(spark, sf_dir, with_nulls=False)
        .filter(F.col("id") % 10 == 0)
        .select("id", "lng", "lat")
    )
    buf = to_ipc_bytes(map_arrow_identity(pts))
    return from_ipc_bytes(spark, buf)
