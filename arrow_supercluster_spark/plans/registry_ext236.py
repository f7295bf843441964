"""Round-10 registry additions, batch 236 — the TPC-H
subquery-DECORRELATION shapes (public spec, tpc.org; Q4 / Q11 / Q15 /
Q16 / Q21 adapted to the test schema, which carries no partsupp /
l_commitdate / l_receiptdate — adaptations documented per query).
The registry already covers 13 of the 22 TPC-H shapes; these five are
the ones whose POINT is a correlated subquery.

The check design is the interesting part: the Spark side is the
HAND-DECORRELATED join plan (semi-join / anti-join / broadcast scalar
— the rewrite Catalyst's DecorrelateInnerQuery performs), while the
DuckDB oracle keeps the textbook CORRELATED subquery form (EXISTS /
NOT EXISTS / scalar subquery / NOT IN).  A MATCH therefore certifies
the decorrelation is semantics-preserving on real data — including the
empty-group and tie edges.

- q_tpch_q4: EXISTS semi-join — orders in a quarter with at least one
  late line (l_shipdate > o_orderdate stands in for the spec's
  commitdate < receiptdate), counted per priority.
- q_tpch_q11: scalar-subquery HAVING — per-part value share vs a
  global total (value = exact integer cents of Σ extendedprice;
  HAVING value·2000 > total compares integers, no float threshold).
- q_tpch_q15: top-revenue view — supplier(s) whose windowed revenue
  equals MAX over the revenue view; revenue in exact milli-units
  (cents × (100 − discount-percent)) so the MAX tie-set is exact.
- q_tpch_q16: NOT IN exclusion — distinct supplier counts per
  (brand, type, size) excluding acctbal-below-1000 suppliers (the
  spec's complaint suppliers; nonzero at every test SF); s_suppkey is
  non-null so NOT IN is safe (the null trap is q_not_in_nulls).
- q_tpch_q21: the double-decorrelation — suppliers that were the ONLY
  late supplier on a multi-supplier order: one EXISTS (another
  supplier's line on the order) and one NOT EXISTS (another
  supplier's LATE line) → semi-join + anti-join in Spark.

At 100 TB: every subquery decorrelates to an equi-join on the order /
part / supplier key with an inequality residual — shuffle-partitioned
by that key, no pairwise stages; Q11/Q15's global scalars are one-row
broadcasts; Q16's exclusion list is a dimension-sized anti-join.
Revenue/value arithmetic is exact-integer until one final division.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_table


def _li(spark, sf_dir):
    return read_table(spark, sf_dir, "lineitem")


def _orders(spark, sf_dir):
    return read_table(spark, sf_dir, "orders")


# exact integer revenue: cents × (100 − discount-percent), both exact
_REV_MILLI_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _rev_milli_col():
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )


# ===========================================================================
# R692 — TPC-H Q4: EXISTS semi-join, order-priority checking
# ===========================================================================


@register(
    "q_tpch_q4",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """R692 — Q4 shape: the oracle keeps the correlated EXISTS; here it
    is a LEFT SEMI join on (l_orderkey = o_orderkey AND l_shipdate >
    o_orderdate) — the equi key carries the shuffle, the date
    inequality rides as the join residual."""
    o = _orders(spark, sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _li(spark, sf_dir).select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "leftsemi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ===========================================================================
# R693 — TPC-H Q11: scalar-subquery HAVING (global share threshold)
# ===========================================================================


@register(
    "q_tpch_q11",
    """
    SELECT l_partkey,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS value_cents
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) * 2000 >
           (SELECT SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
            FROM lineitem)
    ORDER BY value_cents DESC, l_partkey
    """,
)
def q_tpch_q11(spark, sf_dir):
    """R693 — Q11 shape (no partsupp in the test schema, so part value
    = Σ extendedprice cents per l_partkey): oracle HAVING compares
    against an uncorrelated scalar subquery; here the global total is a
    one-row broadcast crossJoin and the threshold compare is
    integer-exact (value·2000 > total — the spec's 0.0001-fraction
    scaled to this corpus)."""
    cents = _li(spark, sf_dir).select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    per_part = cents.groupBy("l_partkey").agg(
        F.sum("cents").alias("value_cents")
    )
    total = cents.agg(F.sum("cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 2000 > F.col("total_cents"))
        .select("l_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "l_partkey")
    )


# ===========================================================================
# R694 — TPC-H Q15: top-revenue view (scalar MAX subquery)
# ===========================================================================


@register(
    "q_tpch_q15",
    f"""
    WITH revenue AS MATERIALIZED (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV_MILLI_SQL}) AS BIGINT) AS total_rev_milli
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev_milli
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_milli = (SELECT MAX(total_rev_milli) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q_tpch_q15(spark, sf_dir):
    """R694 — Q15 shape: the oracle's scalar MAX subquery over the
    revenue view becomes a one-row broadcast joined back; revenue is
    exact milli-units so the tie-set (the spec's 'the view may return
    several suppliers') is reproducible bit-for-bit."""
    rev = (
        _li(spark, sf_dir)
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev_milli_col()).alias("total_rev_milli"))
    )
    mx = rev.agg(F.max("total_rev_milli").alias("mx"))
    sup = read_table(spark, sf_dir, "supplier")
    return (
        sup.join(rev, sup.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_milli") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev_milli")
        .orderBy("s_suppkey")
    )


# ===========================================================================
# R695 — TPC-H Q16: NOT IN exclusion + distinct-supplier counts
# ===========================================================================


@register(
    "q_tpch_q16",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000
    )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark, sf_dir):
    """R695 — Q16 shape (acctbal-below-1000 suppliers stand in for
    the spec's complaint suppliers — nonzero at every test SF): the oracle's NOT IN subquery is a
    LEFT ANTI join here (safe: s_suppkey is non-null; the NOT IN null
    trap itself is q_not_in_nulls' subject)."""
    li = _li(spark, sf_dir).select("l_partkey", "l_suppkey")
    bad = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    kept = li.join(
        F.broadcast(bad), li.l_suppkey == bad.bad_key, "leftanti"
    )
    return (
        kept.join(F.broadcast(part), kept.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


# ===========================================================================
# R696 — TPC-H Q21: EXISTS + NOT EXISTS double decorrelation
# ===========================================================================


@register(
    "q_tpch_q21",
    """
    WITH lo AS MATERIALIZED (
      SELECT l_orderkey, l_suppkey, l_shipdate > o_orderdate AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lo l1
    WHERE l1.l_suppkey = s_suppkey
      AND l1.late
      AND EXISTS (
        SELECT 1 FROM lo l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lo l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.late
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q_tpch_q21(spark, sf_dir):
    """R696 — Q21 shape, the canonical double decorrelation (late =
    l_shipdate > o_orderdate stands in for the spec's receipt-after-
    commit): the EXISTS becomes a LEFT SEMI join keyed on l_orderkey
    with a supplier-inequality residual, the NOT EXISTS a LEFT ANTI
    join with the same key and the late residual — both shuffles ride
    the SAME orderkey partitioning, so AQE reuses the exchange."""
    li = _li(spark, sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderdate")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate")).alias("late"),
    )
    l1 = lo.filter(F.col("late"))
    l2 = lo.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lo.filter(F.col("late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    waiting = l1.join(
        l2, (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2), "leftsemi"
    ).join(
        l3, (F.col("l_orderkey") == l3.k3) & (F.col("l_suppkey") != l3.s3),
        "leftanti",
    )
    sup = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        waiting.join(F.broadcast(sup), waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
