"""Round-7 registry additions, batch 164 — four more canonical TPC-H
query shapes (joining the Q1/Q3/Q4/Q5/Q10/Q15/Q16/Q18/Q21 family;
columns absent from the driver's slimmed schema are adapted and
stated):

- q_tpch_q7 (volume shipping): bilateral revenue between two nations
  by ship year — the five-way join with a symmetric nation-pair
  disjunction, the classic "national trade flow" shape.
- q_tpch_q12 (shipmode priority): per ship-mode counts of high- vs
  low-priority order lines in one ship year. The schema carries no
  l_shipmode/l_commitdate/l_receiptdate, so the mode is a stated
  deterministic surrogate (l_linenumber mod 3 → MAIL/SHIP/TRUCK) and
  the year slices l_shipdate — the CASE-sum pivot shape is intact.
- q_tpch_q13 (customer distribution): orders-per-customer histogram
  INCLUDING zero-order customers via the left join, excluding one
  priority class (stands in for the o_comment NOT LIKE filter).
- q_tpch_q14 (promo effect): percentage of revenue from PROMO-type
  parts in one month — the conditional-aggregation-over-join shape.

At 100 TB: every shape pushes its date filter into the fact scan;
nation/supplier/part dimension sides broadcast (at full TPC-H scale
part shuffles; the plan is identical either way); Q13's left join
shuffles on custkey with the order side pre-filtered.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_Q7_N1, _Q7_N2 = "NATION_13", "NATION_19"
_Q7_START, _Q7_END = "1996-01-01", "1998-01-01"
_Q12_YEAR = 1997
_Q13_EXCL = "1-URGENT"
_Q14_START, _Q14_END = "1997-06-01", "1997-07-01"

_CENTS_SQL = (
    "CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)"
)


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents():
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")


# ===========================================================================
# R487 — TPC-H Q7 (volume shipping)
# ===========================================================================

@register(
    "q_tpch_q7",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           round(SUM(cents) / 100.0, 2) AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             {_CENTS_SQL} AS cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      WHERE ((ns.n_name = '{_Q7_N1}' AND nc.n_name = '{_Q7_N2}')
          OR (ns.n_name = '{_Q7_N2}' AND nc.n_name = '{_Q7_N1}'))
        AND l.l_shipdate >= TIMESTAMP '{_Q7_START} 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '{_Q7_END} 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark, sf_dir):
    """R487 — TPC-H Q7 on the driver schema: revenue shipped between
    {n1} and {n2} (both directions, pair chosen populated at every test SF, reported separately) per ship
    year over [{a}, {b}). Exact integer cents. Plan: the two-year
    date filter pushes into the lineitem scan, supplier/customer
    carry their nation names in via broadcast joins, and the
    symmetric nation-pair disjunction prunes before the revenue agg
    partial-aggregates map-side.""".format(
        n1=_Q7_N1, n2=_Q7_N2, a=_Q7_START, b=_Q7_END
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q7_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q7_END).cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2)
    ) | (
        (F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1)
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(_cents()) / 100.0, 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ===========================================================================
# R488 — TPC-H Q12 (shipmode priority, adapted)
# ===========================================================================

_Q12_MODE_SQL = (
    "CASE l.l_linenumber % 3 WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' "
    "ELSE 'TRUCK' END"
)


@register(
    "q_tpch_q12",
    f"""
    SELECT {_Q12_MODE_SQL} AS shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE year(l.l_shipdate) = {_Q12_YEAR}
    GROUP BY shipmode ORDER BY shipmode
    """,
)
def q_tpch_q12(spark, sf_dir):
    """R488 — TPC-H Q12 shape on the driver schema: per ship mode,
    how many {y} order lines carried high (1-URGENT/2-HIGH) vs low
    priority. The schema has no l_shipmode, so the mode is a stated
    deterministic surrogate (l_linenumber mod 3 → MAIL/SHIP/TRUCK);
    the CASE-sum pivot over a fact-dimension join — the shape the
    real Q12 exercises — is unchanged. Plan: year predicate on the
    lineitem scan, one shuffle join on orderkey, 3-row output from a
    map-side partial CASE-sum.""".format(y=_Q12_YEAR)
    li = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == _Q12_YEAR
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    mode = (
        F.when(F.col("l_linenumber") % 3 == 0, "MAIL")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("TRUCK")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(mode.alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long")
            .alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


# ===========================================================================
# R489 — TPC-H Q13 (customer order distribution)
# ===========================================================================

@register(
    "q_tpch_q13",
    f"""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '{_Q13_EXCL}'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_tpch_q13(spark, sf_dir):
    """R489 — TPC-H Q13: the orders-per-customer histogram, zero-order
    customers INCLUDED via the left join (the part an inner-join
    rollup silently drops), excluding '{e}' orders (stands in for the
    schema's missing o_comment NOT LIKE filter). Plan: orders
    pre-filters then shuffles on custkey against customer; the outer
    histogram is a second small groupBy on the per-customer counts —
    two partial-aggregated exchanges, no window.""".format(e=_Q13_EXCL)
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != _Q13_EXCL)
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ===========================================================================
# R490 — TPC-H Q14 (promotion effect)
# ===========================================================================

@register(
    "q_tpch_q14",
    f"""
    SELECT round(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN cents ELSE 0 END)
                 / SUM(cents), 4) AS promo_revenue_pct,
           round(SUM(cents) / 100.0, 2) AS total_revenue
    FROM (
      SELECT l.l_partkey, {_CENTS_SQL} AS cents
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '{_Q14_START} 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '{_Q14_END} 00:00:00'
    ) l JOIN part p ON p.p_partkey = l.l_partkey
    """,
)
def q_tpch_q14(spark, sf_dir):
    """R490 — TPC-H Q14: share of {a} revenue earned by PROMO-type
    parts (the driver schema's p_type is the single word, so the
    original LIKE 'PROMO%%' is an equality). Exact integer cents keep
    the ratio reproducible. Plan: one-month predicate into the
    lineitem scan, part broadcasts, single 1-row conditional agg.""".format(
        a=_Q14_START
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_END).cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        _cents().alias("cents"), "p_type"
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", F.col("cents")).otherwise(0)
    )
    return j.agg(
        F.round(100.0 * promo / F.sum("cents"), 4).alias(
            "promo_revenue_pct"
        ),
        F.round(F.sum("cents") / 100.0, 2).alias("total_revenue"),
    )
