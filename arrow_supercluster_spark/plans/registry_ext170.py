"""Round-7 registry additions, batch 165 — the last four TPC-H shapes
the slimmed driver schema can express (completing the family: only the
partsupp-dependent Q2/Q11/Q20 remain structurally out of reach, and
their join shapes are already covered by q_min_cost_supplier /
q_supplier_part_counts):

- q_tpch_q8 (market share): one supplier nation's share of STANDARD-
  part revenue sold to ASIA-region customers, per order year — the
  conditional-share-of-total shape over a seven-table join.
- q_tpch_q17 (small-quantity revenue): revenue locked in lineitems
  whose quantity is below 20%% of their part's average — the
  correlated-scalar-subquery shape, decorrelated into a per-part agg
  join (p_brand filter stands in for the missing p_container).
- q_tpch_q19 (disjunctive predicates): revenue matching any of three
  (brand, size-band, quantity-band) disjuncts — the OR-of-conjunctions
  filter the optimizer must not turn into a cross product.
- q_tpch_q22 (global sales opportunity): nations of above-average-
  balance customers with NO RECENT orders (date-windowed anti-join —
  every synthetic customer has SOME order, so "never ordered" is
  adapted to "no order since the cutoff", stated; the scalar-avg
  filter + anti-join + rollup shape is intact).

At 100 TB: Q8 broadcasts all five dimension sides and partial-
aggregates the year cells map-side; Q17's per-part average is one
groupBy on partkey co-partitioned with the fact join; Q19 is a pure
scan predicate after the part broadcast; Q22's anti-join shuffles
custkey once against the date-pruned orders scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_Q8_REGION = "ASIA"
_Q8_TYPE = "STANDARD"
_Q8_NATION = "NATION_9"
_Q8_START, _Q8_END = "1996-01-01", "1998-01-01"
_Q17_BRAND = "Brand#13"
_Q17_FRACTION = 0.2
_Q19_BANDS = (
    ("Brand#13", 1, 15, 1.0, 20.0),
    ("Brand#19", 10, 30, 10.0, 30.0),
    ("Brand#4", 20, 50, 20.0, 40.0),
)
_Q22_CUTOFF = "1999-01-01"

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
# R491 — TPC-H Q8 (national market share)
# ===========================================================================

@register(
    "q_tpch_q8",
    f"""
    WITH vol AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             {_CENTS_SQL} AS cents,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_TYPE}'
        AND o.o_orderdate >= TIMESTAMP '{_Q8_START} 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '{_Q8_END} 00:00:00'
    )
    SELECT o_year,
           round(SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                          THEN cents ELSE 0 END) * 1.0
                 / SUM(cents), 6) AS mkt_share,
           round(SUM(cents) / 100.0, 2) AS total_volume
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q_tpch_q8(spark, sf_dir):
    """R491 — TPC-H Q8 on the driver schema: {n}'s share of {t}-part
    revenue sold to {r}-region customers per order year in [{a}, {b}).
    Exact integer cents; the share is one conditional sum over the
    same cells. Plan: region/nation/part/supplier all broadcast, the
    date filter pushes into the orders scan, and the year cells
    partial-aggregate map-side — one shuffle for the fact joins, one
    2-row output agg.""".format(
        n=_Q8_NATION, t=_Q8_TYPE, r=_Q8_REGION, a=_Q8_START, b=_Q8_END
    )
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == _Q8_TYPE)
    n = _t(spark, sf_dir, "nation")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == _Q8_REGION)
    nc = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("cnk"))
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("cnk"))
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q8_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q8_END).cast("timestamp"))
    )
    vol = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _cents().alias("cents"),
            "supp_nation",
        )
    )
    nat = F.sum(
        F.when(F.col("supp_nation") == _Q8_NATION, F.col("cents"))
        .otherwise(0)
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(nat * 1.0 / F.sum("cents"), 6).alias("mkt_share"),
            F.round(F.sum("cents") / 100.0, 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


# ===========================================================================
# R492 — TPC-H Q17 (small-quantity-order revenue)
# ===========================================================================

@register(
    "q_tpch_q17",
    f"""
    WITH br AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = '{_Q17_BRAND}'
    ),
    avgq AS (
      SELECT l_partkey, AVG(l_quantity) AS aq FROM br GROUP BY l_partkey
    )
    SELECT round(SUM(CAST(round(br.l_extendedprice * 100) AS BIGINT))
                 / 100.0 / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM br JOIN avgq ON br.l_partkey = avgq.l_partkey
    WHERE br.l_quantity < {_Q17_FRACTION} * avgq.aq
    """,
)
def q_tpch_q17(spark, sf_dir):
    """R492 — TPC-H Q17: revenue in {b} lineitems whose quantity is
    under {f}× their part's average quantity, annualized over the
    classic 7 years (p_brand stands in for the schema's missing
    p_container). The correlated scalar subquery decorrelates into a
    per-part average joined back on partkey — both sides of that join
    shuffle on the SAME key, so co-partitioning is free; exact cents
    before the divide.""".format(b=_Q17_BRAND, f=_Q17_FRACTION)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == _Q17_BRAND)
    br = li.join(
        F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    avgq = br.groupBy("l_partkey").agg(F.avg("l_quantity").alias("aq"))
    j = br.join(avgq, "l_partkey").filter(
        F.col("l_quantity") < _Q17_FRACTION * F.col("aq")
    )
    return j.agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            / 100.0 / 7.0,
            2,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ===========================================================================
# R493 — TPC-H Q19 (disjunctive predicate revenue)
# ===========================================================================

_Q19_SQL_DISJ = " OR ".join(
    f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s1} AND {s2} "
    f"AND l.l_quantity BETWEEN {q1} AND {q2})"
    for b, s1, s2, q1, q2 in _Q19_BANDS
)


@register(
    "q_tpch_q19",
    f"""
    SELECT round(SUM({_CENTS_SQL}) / 100.0, 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {_Q19_SQL_DISJ}
    """,
)
def q_tpch_q19(spark, sf_dir):
    """R493 — TPC-H Q19: revenue from lineitems matching any of three
    (brand, size-band, quantity-band) conjunctions (p_size stands in
    for the schema's missing p_container; shipmode/instruct predicates
    dropped, stated). The OR-of-ANDs must stay a JOIN FILTER — the
    part side broadcasts and the disjunction evaluates post-join in
    whole-stage codegen, never as three separate joins or a cross
    product."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    disj = None
    for b, s1, s2, q1, q2 in _Q19_BANDS:
        term = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s1, s2)
            & F.col("l_quantity").between(q1, q2)
        )
        disj = term if disj is None else (disj | term)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(disj)
        .agg(
            F.round(F.sum(_cents()) / 100.0, 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ===========================================================================
# R494 — TPC-H Q22 (global sales opportunity, date-windowed)
# ===========================================================================

@register(
    "q_tpch_q22",
    f"""
    WITH avgbal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    ),
    lapsed AS (
      SELECT c.c_nationkey, c.c_acctbal
      FROM customer c, avgbal
      WHERE c.c_acctbal > avgbal.a
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00')
    )
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           round(SUM(c_acctbal), 2) AS totacctbal
    FROM lapsed GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q_tpch_q22(spark, sf_dir):
    """R494 — TPC-H Q22 on the driver schema: per nation, the count
    and balance mass of above-average-balance customers with no order
    since {d} (the synthetic data gives every customer SOME order, so
    "never ordered" adapts to a date-windowed anti-join — stated;
    c_nationkey stands in for the phone-prefix country code). Plan:
    the positive-balance average is a 1-row broadcast scalar, the
    anti-join shuffles custkey against the date-PRUNED orders scan
    (the pushdown is the point — at 100 TB the cutoff eliminates most
    order partitions before the join), then one small rollup.""".format(
        d=_Q22_CUTOFF
    )
    c = _t(spark, sf_dir, "customer")
    avgbal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    lapsed = (
        c.crossJoin(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        lapsed.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
