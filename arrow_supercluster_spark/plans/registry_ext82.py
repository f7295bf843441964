"""Round-3 registry additions, batch 77 — TPC-H decorrelation shapes
(Q4/Q15/Q16/Q18 flavors on the driver's simplified schema), completing
the warehouse-join family around the existing Q1/Q5 shapes:

- q_waiting_orders: EXISTS-decorrelated semi-join with a cross-table
  date predicate (Q4);
- q_top_supplier: aggregate → global max → equality join-back (Q15's
  view, decorrelated without a window);
- q_supplier_part_counts: anti-join exclusion + COUNT(DISTINCT) (Q16);
- q_large_orders: HAVING-filtered agg joined back through two
  dimensions (Q18).

All four oracle-checked; date arithmetic mirrored token-for-token
(timestamps + INTERVAL), float revenue rounded at 4 (sums of
price-scale doubles; residual association error ≪ the grid), quantity
sums exact (integer-valued doubles sum exactly in fp at any order).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_table

_Q15_LO, _Q15_HI = "1995-01-01", "1995-04-01"
_Q18_QTY = 250.0


@register(
    "q_waiting_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_waiting_orders(spark, sf_dir):
    """Warehouse — TPC-H Q4 shape: orders with at least one lineitem
    shipping >60 days after order date, counted by priority. The EXISTS
    decorrelates to a LEFT SEMI hash join on o_orderkey whose extra
    date predicate rides the join condition — no row duplication from
    multi-lineitem orders, one shuffle on the key, then a ≤5-key agg."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    waiting = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return waiting.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "q_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, round(SUM(l_extendedprice * (1 - l_discount)), 4)
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_LO}'
        AND l_shipdate <  TIMESTAMP '{_Q15_HI}'
      GROUP BY l_suppkey
    ),
    mx AS (SELECT MAX(total_rev) AS mr FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN mx ON r.total_rev = mx.mr
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
)
def q_top_supplier(spark, sf_dir):
    """Warehouse — TPC-H Q15 shape (top revenue supplier for a quarter)
    WITHOUT the unpartitioned rank window: per-supplier revenue (one
    keyed agg), global max as a broadcast 1-row aggregate, equality
    join-back — the decorrelated form that never funnels the supplier
    set through one reducer. Revenue rounded at 4 BEFORE the max/equality
    so the selection grid is identical cross-engine."""
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(_Q15_LO).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q15_HI).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mr"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mr"))
        .join(F.broadcast(sup), sup.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@register(
    "q_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS n_supp
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 20
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
)
def q_supplier_part_counts(spark, sf_dir):
    """Warehouse — TPC-H Q16 shape: distinct supplier count per
    (brand, size), excluding negative-balance suppliers. The NOT IN is
    a broadcast anti-join against a tiny exclusion list; the part
    dimension broadcasts; COUNT(DISTINCT) runs as Spark's two-phase
    expand+agg, never a driver dedup."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    sup = read_table(spark, sf_dir, "supplier")
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(
            F.broadcast(
                part.filter(F.col("p_size") <= 20).select(
                    "p_partkey", "p_brand", "p_size"
                )
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
    )


@register(
    "q_large_orders",
    f"""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > {_Q18_QTY}
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_large_orders(spark, sf_dir):
    """Warehouse — TPC-H Q18 shape (large-volume orders): HAVING-filtered
    quantity rollup joined back through orders and customer. The rollup
    collapses lineitem to |orders| rows BEFORE any dimension join (the
    agg-below-join order that matters at fact-table scale); quantities
    are integer-valued doubles, so the sums are exact in fp at any
    accumulation order — no rounding needed for the cross-engine hash."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
    )
