"""Round-5 registry additions, batch 104 — space-filling-curve data
layout and temporal interval algebra:

- q_hilbert_order: Hilbert curve index (order 8, 256×256 grid) for the
  point table — the locality-preserving sibling of q_zorder_scan's
  Morton key: Hilbert has no diagonal jumps, so range scans over
  curve-contiguous file chunks touch strictly fewer cells. The xy→d
  transform is 8 unrolled rotate/flip steps — a pure projection that
  whole-stage-codegens into the scan; the oracle replays the identical
  steps as 8 chained CTEs.
- q_allen_relations: Allen's interval algebra over each customer's
  consecutive order fulfillment windows [order date, max ship date]: classify all 13 relations with one canonical CASE chain and
  histogram them — the vocabulary every temporal-join optimizer
  (overlap join, during-containment) is built on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS_NONULL

_HILBERT_P = 8  # curve order: 2^8 × 2^8 grid
_HN = 1 << _HILBERT_P


def _sql_hilbert() -> str:
    steps = []
    prev = "g"
    for i, s in enumerate(1 << b for b in range(_HILBERT_P - 1, -1, -1)):
        steps.append(f"""
    h{i} AS (
      SELECT id, hx, hy,
             CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - y ELSE y END)
                  ELSE x END AS x,
             CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - x ELSE x END)
                  ELSE y END AS y,
             d + {s * s} * xor(3 * rx, ry) AS d
      FROM (SELECT id, hx, hy, x, y, d,
                   CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
                   CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
            FROM {prev})
    )""")
        prev = f"h{i}"
    return f"""
    WITH g AS (
      SELECT id,
             least(CAST(floor((lng + 180.0) / 360.0 * {_HN}) AS INTEGER),
                   {_HN - 1}) AS hx,
             least(CAST(floor((lat + 90.0) / 180.0 * {_HN}) AS INTEGER),
                   {_HN - 1}) AS hy,
             least(CAST(floor((lng + 180.0) / 360.0 * {_HN}) AS INTEGER),
                   {_HN - 1}) AS x,
             least(CAST(floor((lat + 90.0) / 180.0 * {_HN}) AS INTEGER),
                   {_HN - 1}) AS y,
             0 AS d
      FROM ({SQL_POINTS_NONULL}) p
    ),{",".join(steps)}
    SELECT id, hx, hy, CAST(d AS BIGINT) AS hilbert_d FROM {prev}
    """


@register("q_hilbert_order", _sql_hilbert())
def q_hilbert_order(spark, sf_dir):
    """Hilbert index, order {p}: per step s = 2^k..1 the standard
    rotate/flip recurrence (rx/ry quadrant bits, d += s²·((3rx)⊕ry),
    conditional reflect + swap). Unrolled into {p} chained projections —
    Catalyst collapses them into ONE whole-stage-codegen'd map over the
    scan, no shuffle, no UDF; writing files in hilbert_d order is the
    data-layout step that makes bbox scans prune contiguous chunks
    (q_zorder_scan's Morton key jumps diagonally; Hilbert never
    does).""".format(p=_HILBERT_P)
    from arrow_supercluster_spark.sources.points import derived_points

    pts = derived_points(spark, sf_dir, with_nulls=False)
    hx = F.least(
        F.floor((F.col("lng") + 180.0) / 360.0 * _HN).cast("int"),
        F.lit(_HN - 1),
    )
    hy = F.least(
        F.floor((F.col("lat") + 90.0) / 180.0 * _HN).cast("int"),
        F.lit(_HN - 1),
    )
    cur = pts.select(
        "id", hx.alias("hx"), hy.alias("hy"),
        hx.alias("x"), hy.alias("y"), F.lit(0).alias("d"),
    )
    for s in (1 << b for b in range(_HILBERT_P - 1, -1, -1)):
        rx = F.when(F.col("x").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("y").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        cur = cur.select(
            "id", "hx", "hy", "x", "y", "d",
            rx.alias("rx"), ry.alias("ry"),
        ).select(
            "id", "hx", "hy",
            F.when(
                F.col("ry") == 0,
                F.when(F.col("rx") == 1, F.lit(s - 1) - F.col("y")).otherwise(
                    F.col("y")
                ),
            )
            .otherwise(F.col("x"))
            .alias("x"),
            F.when(
                F.col("ry") == 0,
                F.when(F.col("rx") == 1, F.lit(s - 1) - F.col("x")).otherwise(
                    F.col("x")
                ),
            )
            .otherwise(F.col("y"))
            .alias("y"),
            (
                F.col("d")
                + F.lit(s * s)
                * (F.lit(3) * F.col("rx")).bitwiseXOR(F.col("ry"))
            ).alias("d"),
        )
    return cur.select("id", "hx", "hy", F.col("d").cast("long").alias("hilbert_d"))


@register(
    "q_allen_relations",
    """
    WITH iv AS (
      SELECT o.o_custkey AS cust, o.o_orderkey AS ok,
             MIN(o.o_orderdate) AS s, MAX(l.l_shipdate) AS e
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT cust, s AS a_s, e AS a_e,
             lead(s) OVER w AS b_s, lead(e) OVER w AS b_e
      FROM iv
      WINDOW w AS (PARTITION BY cust ORDER BY s, e, ok)
    ),
    rel AS (
      SELECT CASE
        WHEN a_e < b_s THEN 'before'
        WHEN a_e = b_s THEN 'meets'
        WHEN a_s = b_s AND a_e = b_e THEN 'equals'
        WHEN a_s = b_s AND a_e < b_e THEN 'starts'
        WHEN a_s = b_s AND a_e > b_e THEN 'started_by'
        WHEN a_e = b_e AND a_s < b_s THEN 'finished_by'
        WHEN a_e = b_e AND a_s > b_s THEN 'finishes'
        WHEN a_s < b_s AND a_e > b_e THEN 'contains'
        WHEN a_s > b_s AND a_e < b_e THEN 'during'
        WHEN a_s < b_s AND a_e > b_s AND a_e < b_e THEN 'overlaps'
        WHEN a_s > b_s AND a_s < b_e AND a_e > b_e THEN 'overlapped_by'
        WHEN a_s = b_e THEN 'met_by'
        ELSE 'after'
      END AS relation
      FROM pairs WHERE b_s IS NOT NULL
    )
    SELECT relation, CAST(COUNT(*) AS BIGINT) AS n
    FROM rel GROUP BY relation
    """,
)
def q_allen_relations(spark, sf_dir):
    """Allen's 13 interval relations, histogrammed over each customer's
    consecutive order-fulfillment windows [order date, max ship date]. The
    CASE chain tests equalities before strict orders, so every pair
    lands in exactly one of the 13 buckets (canonical Allen
    disjointness). Per-customer lead() is a PARTITIONED window; the
    interval build is one keyed order/lineitem join+agg — the temporal
    vocabulary under overlap/during joins, as data."""
    from pyspark.sql import Window

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    iv = (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderkey").alias("ok"),
        )
        .agg(
            F.min("o_orderdate").alias("s"), F.max("l_shipdate").alias("e")
        )
    )
    w = Window.partitionBy("cust").orderBy("s", "e", "ok")
    pairs = iv.select(
        "cust",
        F.col("s").alias("a_s"),
        F.col("e").alias("a_e"),
        F.lead("s").over(w).alias("b_s"),
        F.lead("e").over(w).alias("b_e"),
    ).filter(F.col("b_s").isNotNull())
    a_s, a_e, b_s, b_e = (F.col(c) for c in ("a_s", "a_e", "b_s", "b_e"))
    relation = (
        F.when(a_e < b_s, "before")
        .when(a_e == b_s, "meets")
        .when((a_s == b_s) & (a_e == b_e), "equals")
        .when((a_s == b_s) & (a_e < b_e), "starts")
        .when((a_s == b_s) & (a_e > b_e), "started_by")
        .when((a_e == b_e) & (a_s < b_s), "finished_by")
        .when((a_e == b_e) & (a_s > b_s), "finishes")
        .when((a_s < b_s) & (a_e > b_e), "contains")
        .when((a_s > b_s) & (a_e < b_e), "during")
        .when((a_s < b_s) & (a_e > b_s) & (a_e < b_e), "overlaps")
        .when((a_s > b_s) & (a_s < b_e) & (a_e > b_e), "overlapped_by")
        .when(a_s == b_e, "met_by")
        .otherwise("after")
    )
    return (
        pairs.select(relation.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n"))
    )
