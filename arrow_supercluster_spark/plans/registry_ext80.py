"""Round-2 registry additions, batch 75 — pricing bands and two-role
aggregation:

- q_discount_bands: quantity and revenue per discount band — the
  pricing-response table (TPC-H Q6's what-if, generalized);
- q_trade_balance: per nation, revenue where its customers BUY vs
  revenue where its suppliers SELL — the two-role join over the same
  fact table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_table


@register(
    "q_discount_bands",
    """
    SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
           COUNT(*) AS n_items,
           round(AVG(l_quantity), 6) AS avg_qty,
           round(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    GROUP BY 1
    """,
)
def q_discount_bands(spark, sf_dir):
    """Pricing — the discount-response table: items, average quantity,
    and net revenue per integer discount percent (does a deeper
    discount move volume? — TPC-H Q6's revenue-effect question as a
    full band table). One ≤11-key partial agg."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.round(F.col("l_discount") * 100).cast("long").alias("discount_pct")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


@register(
    "q_trade_balance",
    """
    WITH bought AS (
      SELECT c.c_nationkey AS nk,
             round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS buy_rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1
    ),
    sold AS (
      SELECT s.s_nationkey AS nk,
             round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS sell_rev
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1
    )
    SELECT n.n_name AS nation,
           coalesce(b.buy_rev, 0.0) AS buy_rev,
           coalesce(s.sell_rev, 0.0) AS sell_rev,
           round(coalesce(s.sell_rev, 0.0) - coalesce(b.buy_rev, 0.0), 4)
             AS balance
    FROM nation n
    LEFT JOIN bought b ON b.nk = n.n_nationkey
    LEFT JOIN sold s ON s.nk = n.n_nationkey
    """,
)
def q_trade_balance(spark, sf_dir):
    """Two-role analysis — each nation's TRADE BALANCE: revenue its
    customers spend (via orders) vs revenue its suppliers earn (via
    line supply) — the same fact table aggregated through two different
    dimension paths and reconciled on the nation key. Two fact aggs
    (one with the orderkey join), |nations|-row reconciliation."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = read_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    bought = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.round(F.sum(rev), 4).alias("buy_rev"))
    )
    sold = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.round(F.sum(rev), 4).alias("sell_rev"))
    )
    return (
        n.join(bought, n.n_nationkey == bought.nk, "left")
        .join(sold, n.n_nationkey == sold.nk, "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("buy_rev", F.lit(0.0)).alias("buy_rev"),
            F.coalesce("sell_rev", F.lit(0.0)).alias("sell_rev"),
            F.round(
                F.coalesce("sell_rev", F.lit(0.0))
                - F.coalesce("buy_rev", F.lit(0.0)),
                4,
            ).alias("balance"),
        )
    )
