"""Round-6 registry additions, batch 158 — three more canonical TPC-H
query shapes (joining q_tpch_q5 / q_lineitem_agg / q_join_agg in the
benchmark-parity family; columns absent from the driver's slimmed
schema are adapted and stated):

- q_tpch_q3 (shipping priority): BUILDING-segment customers, orders
  placed before / lines shipped after the cut date, revenue per order
  — the selective 3-way join + agg + top-N shape. o_orderpriority
  stands in for the schema's missing o_shippriority.
- q_tpch_q10 (returned-item reporting): revenue lost to 'R' returns
  per customer over one quarter, nation joined in — the
  fact-to-two-dims shape with a date-sliced fact filter; top 20.
- q_tpch_q18 (large-volume customers): orders whose total quantity
  exceeds a threshold via a group-filter semi-join, then customer
  attribution — the classic HAVING-subquery shape.

At 100 TB: Q3/Q10 push their date/segment filters into the parquet
scan and broadcast the dimension side (customer/nation are the small
sides locally; at full TPC-H scale customer shuffles and nation still
broadcasts); Q18's HAVING subquery is a self-contained aggregation
whose output (qualifying orderkeys) is broadcast back against orders
— no row explosion anywhere.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_Q3_SEG = "BUILDING"
_Q3_DATE = "1998-01-01"
_Q10_START = "1997-01-01"
_Q10_END = "1997-04-01"
_Q18_QTY = 300.0


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ===========================================================================
# R467 — TPC-H Q3 (shipping priority, adapted)
# ===========================================================================

@register(
    "q_tpch_q3",
    f"""
    SELECT l.l_orderkey,
           round(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) / 100.0, 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{_Q3_SEG}'
      AND o.o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
      AND l.l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """R467 — TPC-H Q3 on the driver schema: {seg}-segment customers,
    orders before {d}, lines shipped after it; revenue from exact
    integer cents; top-10 by (revenue DESC, orderdate, orderkey) —
    the deterministic tie rule both engines share. Plan: the segment
    filter prunes customer BEFORE the join (broadcast-sized here; at
    SF100k it hash-shuffles), the date predicates push into both
    parquet scans, and the agg partial-aggregates map-side before the
    TakeOrdered(10).""".format(seg=_Q3_SEG, d=_Q3_DATE)
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == _Q3_SEG
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_Q3_DATE).cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_Q3_DATE).cast("timestamp")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ===========================================================================
# R468 — TPC-H Q10 (returned-item reporting, adapted)
# ===========================================================================

@register(
    "q_tpch_q10",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) / 100.0, 2)
             AS lost_revenue,
           round(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{_Q10_START} 00:00:00'
      AND o.o_orderdate < TIMESTAMP '{_Q10_END} 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """R468 — TPC-H Q10: revenue lost to returns ('R' lines) in the
    {s}..{e} quarter, attributed to customers with their nation.
    Plan: the returnflag + quarter predicates push into the fact
    scans, nation (25 rows) broadcasts unconditionally, customer
    broadcasts at this SF (would shuffle at full scale — stated), and
    the agg keys on the customer grain before TakeOrdered(20) with the
    (revenue DESC, custkey) tie rule.""".format(
        s=_Q10_START, e=_Q10_END
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_END).cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("lost_revenue"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "lost_revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


# ===========================================================================
# R469 — TPC-H Q18 (large-volume customers)
# ===========================================================================

@register(
    "q_tpch_q18",
    f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {_Q18_QTY}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           round(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_q18(spark, sf_dir):
    """R469 — TPC-H Q18: orders whose total quantity exceeds {q},
    re-joined to customer. Plan: the HAVING subquery aggregates
    lineitem once (partial map-side sums), its qualifying-orderkey
    output is tiny and BROADCAST back as a semi-join against orders —
    the aggregate-then-semijoin shape that avoids carrying the fact
    table through the qualification. Top-100 by the spec's
    (totalprice DESC, orderdate) order plus orderkey for
    determinism.""".format(q=_Q18_QTY)
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(
            F.broadcast(big.withColumnRenamed("l_orderkey", "bk")),
            li.l_orderkey == F.col("bk"),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice",
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )
