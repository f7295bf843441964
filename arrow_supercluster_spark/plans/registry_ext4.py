"""Registry entries: grouping sets / rollup, set operations, date/string
functions, and the style layer wired to the REAL descendant closure —
rounding out the relational substrate (SURVEY §2a note on operator
categories absent from the reference)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry_core import _points_xy, register
from arrow_supercluster_spark.plans.registry_cluster import _sql_nodes_points


# ===========================================================================
# Rollup / grouping sets
# ===========================================================================

@register(
    "q_rollup_agg",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstatus,
           COUNT(*) AS n, round(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_agg(spark, sf_dir):
    """ROLLUP hierarchy totals — the multi-level aggregation shape the
    zoom hierarchy generalizes (same partial-agg plan, one shuffle)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "q_set_ops",
    """
    SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
    UNION
    SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_set_ops(spark, sf_dir):
    """Set operations (the reference has only Q6's concat-union): the SQL
    precedence chain ((A INTERSECT B) UNION C) EXCEPT D, identical in
    both engines."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("k"))
    b = o.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k"))
    cc = c.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("k"))
    d = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    return a.intersect(b).union(cc).distinct().exceptAll(d.distinct())


@register(
    "q_date_funcs",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           COUNT(*) AS n_orders,
           round(SUM(o_totalprice), 2) AS revenue,
           MIN(upper(substr(o_orderpriority, 1, 1))) AS min_prio_initial
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_date_funcs(spark, sf_dir):
    """Date/string function coverage (year/month extraction, substr/upper)
    over event-time-style data — all JVM intrinsics."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.min(F.upper(F.substring("o_orderpriority", 1, 1))).alias(
                "min_prio_initial"
            ),
        )
        .orderBy("yr", "mo")
    )


# ===========================================================================
# V1 with the REAL descendant closure (focused cluster → secondary color)
# ===========================================================================

@register(
    "q_fill_colors_focused",
    f"""
    WITH anchor AS (
      SELECT cell_x AS ax, cell_y AS ay FROM ({_sql_nodes_points(3)}) WHERE id = 1
    )
    SELECT p.id,
           CASE WHEN p.id % 50 = 0 THEN 'selected'
                WHEN p.cell_x = anchor.ax AND p.cell_y = anchor.ay THEN 'secondary'
                ELSE 'primary' END AS color
    FROM ({_sql_nodes_points(3)}) p, anchor
    """,
)
def q_fill_colors_focused(spark, sf_dir):
    """V1 with the real focus semantics (style-helpers.ts:11-47 +
    _updateFocusedChildren): points under the focused cluster (the z3 cell
    containing id=1 — i.e. its leaf descendants, J2) get the secondary
    color; selection still wins (priority order tested by the reference,
    style-helpers.test.ts:103-118). The descendant test is the closed-form
    cell-membership predicate — a broadcast join, no recursion."""
    pts = gc.with_cells(_points_xy(spark, sf_dir), 3, OPTS)
    anchor = pts.filter(F.col("id") == 1).select(
        F.col("cell_x").alias("ax"), F.col("cell_y").alias("ay")
    )
    joined = pts.crossJoin(F.broadcast(anchor))
    return joined.select(
        "id",
        F.when(F.col("id") % 50 == 0, "selected")
        .when(
            (F.col("cell_x") == F.col("ax")) & (F.col("cell_y") == F.col("ay")),
            "secondary",
        )
        .otherwise("primary")
        .alias("color"),
    )
