"""Round-2 registry additions, batch 27 — decision-support joins and
density surfaces:

- q_tpch_q5: the TPC-H Q5 shape (local-supplier volume): 6-table join
  with region filter and date range, revenue per nation — the
  multi-join planning exhibit for the relational substrate;
- q_min_cost_supplier: cheapest supplier per part — the classic
  correlated-subquery shape, decorrelated to ONE struct-min aggregate;
- q_kde_heatmap: Gaussian kernel density on the 2° grid — the heatmap
  surface behind every point-density visualization (the density sibling
  of the reference's cluster counts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points
from arrow_supercluster_spark.sources.tables import read_table

# ===========================================================================
# TPC-H Q5 shape
# ===========================================================================

_Q5_REGION = "ASIA"
_Q5_FROM, _Q5_TO = "1995-01-01", "1999-01-01"  # testdata orders span 1995..2001


@register(
    "q_tpch_q5",
    f"""
    SELECT n.n_name AS nation,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = '{_Q5_REGION}'
      AND o.o_orderdate >= TIMESTAMP '{_Q5_FROM}'
      AND o.o_orderdate < TIMESTAMP '{_Q5_TO}'
    GROUP BY 1
    """,
)
def q_tpch_q5(spark, sf_dir):
    """Relational substrate — the TPC-H Q5 'local supplier volume'
    shape: revenue by nation where the customer and the line's supplier
    share a nation, one region, a four-year order-date range. Plan: region →
    nation → supplier/customer are broadcast dims (hinted), the only
    shuffles are orders⋈customer (custkey) and lineitem⋈orders
    (orderkey); the date filter pushes into the orders scan, pruning
    before the big join. Catalyst reorders the dim joins — exactly the
    class of rewrites the reference engine has no optimizer for."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q5_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q5_TO).cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == _Q5_REGION)
    joined = (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ===========================================================================
# Min-cost supplier per part (decorrelated)
# ===========================================================================

@register(
    "q_min_cost_supplier",
    """
    WITH priced AS (
      SELECT l_partkey, l_suppkey,
             round(l_extendedprice / l_quantity, 6) AS unit_price
      FROM lineitem
    ),
    best AS (
      SELECT l_partkey,
             MIN(unit_price) AS best_price,
             MIN(CASE WHEN unit_price = m THEN l_suppkey END) AS best_supp
      FROM (
        SELECT *, MIN(unit_price) OVER (PARTITION BY l_partkey) AS m
        FROM priced
      )
      GROUP BY 1
    )
    SELECT b.l_partkey AS partkey, b.best_price, b.best_supp AS suppkey,
           s.s_name, n.n_name AS nation
    FROM best b
    JOIN supplier s ON s.s_suppkey = b.best_supp
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """Relational substrate — cheapest supplier per part (the TPC-H Q2
    correlated-subquery shape without partsupp): min unit price per
    part with a deterministic min-suppkey tie-break, decorrelated to a
    SINGLE struct-min aggregate — `min(struct(price, suppkey))` gives
    the argmin in one partial-aggregating pass, no window, no self-join
    back (the oracle keeps the window form — a different plan proving
    the same answer). Supplier/nation attach by broadcast. Unit price
    rounds to 6 BEFORE the min so a 1-ulp division difference can't
    flip a tie."""
    l = read_table(spark, sf_dir, "lineitem")
    priced = l.select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias(
            "unit_price"
        ),
    )
    best = priced.groupBy("l_partkey").agg(
        F.min(F.struct("unit_price", "l_suppkey")).alias("b")
    ).select(
        F.col("l_partkey").alias("partkey"),
        F.col("b.unit_price").alias("best_price"),
        F.col("b.l_suppkey").alias("suppkey"),
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    return (
        best.join(F.broadcast(s), best.suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("partkey", "best_price", "suppkey", "s_name",
                F.col("n_name").alias("nation"))
    )


# ===========================================================================
# Gaussian KDE heatmap
# ===========================================================================

_KDE_CELL = 2.0  # degrees; sigma = one cell


@register(
    "q_kde_heatmap",
    f"""
    WITH pts AS (
      SELECT lng, lat FROM ({SQL_POINTS})
      WHERE lng IS NOT NULL AND lat IS NOT NULL
    ),
    contrib AS (
      SELECT CAST(floor(lng / {_KDE_CELL}) AS BIGINT) + dx.d AS cx,
             CAST(floor(lat / {_KDE_CELL}) AS BIGINT) + dy.d AS cy,
             exp(-(
               (lng - ((CAST(floor(lng / {_KDE_CELL}) AS BIGINT) + dx.d) * {_KDE_CELL} + {_KDE_CELL / 2}))
               * (lng - ((CAST(floor(lng / {_KDE_CELL}) AS BIGINT) + dx.d) * {_KDE_CELL} + {_KDE_CELL / 2}))
               + (lat - ((CAST(floor(lat / {_KDE_CELL}) AS BIGINT) + dy.d) * {_KDE_CELL} + {_KDE_CELL / 2}))
               * (lat - ((CAST(floor(lat / {_KDE_CELL}) AS BIGINT) + dy.d) * {_KDE_CELL} + {_KDE_CELL / 2}))
             ) / (2.0 * {_KDE_CELL * _KDE_CELL})) AS w
      FROM pts
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    )
    SELECT cx, cy, round(SUM(w), 6) AS density, COUNT(*) AS n_contrib
    FROM contrib GROUP BY 1, 2
    """,
)
def q_kde_heatmap(spark, sf_dir):
    """Geo visualization — truncated-Gaussian kernel density on the 2°
    grid (σ = one cell, support = the 3×3 neighborhood): the heatmap
    layer's aggregation. Each point contributes to its 9 neighbor cells
    via a 9-element explode (narrow generator — the radius_cluster cell
    trick in density form), then ONE partial-agg group-by on the cell
    key. Nothing quadratic anywhere; at 100 TB this is explode + one
    shuffle keyed by ~10⁴ cells. exp() weights are engine-libm — the
    cell sums round to 6 before hashing."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    )
    base_x = F.floor(F.col("lng") / _KDE_CELL).cast("long")
    base_y = F.floor(F.col("lat") / _KDE_CELL).cast("long")
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    e = pts.select(
        "lng", "lat", base_x.alias("bx"), base_y.alias("by"),
        F.explode(offs).alias("o"),
    ).select(
        "lng", "lat",
        (F.col("bx") + F.col("o.dx")).alias("cx"),
        (F.col("by") + F.col("o.dy")).alias("cy"),
    )
    ctr_x = F.col("cx") * _KDE_CELL + _KDE_CELL / 2
    ctr_y = F.col("cy") * _KDE_CELL + _KDE_CELL / 2
    d2 = (F.col("lng") - ctr_x) * (F.col("lng") - ctr_x) + (
        F.col("lat") - ctr_y
    ) * (F.col("lat") - ctr_y)
    w = F.exp(-d2 / (2.0 * _KDE_CELL * _KDE_CELL))
    return (
        e.select("cx", "cy", w.alias("w"))
        .groupBy("cx", "cy")
        .agg(
            F.round(F.sum("w"), 6).alias("density"),
            F.count(F.lit(1)).alias("n_contrib"),
        )
    )
