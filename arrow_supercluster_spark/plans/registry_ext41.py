"""Round-2 registry additions, batch 36 — warehouse-layout surface made
driver-visible:

- q_bucketed_join: the co-located (bucketed) fact-fact join — results
  proven against the plain join, zero-Exchange plan gated in tests;
- q_sql_interface: ONE SQL string executed verbatim by spark.sql over
  register_views AND by the DuckDB oracle — the SQL-only consumer path;
- q_zorder_scan: bbox scan over the Z-ordered point layout — content
  proven against the unordered relation (row-group pruning itself is
  gated in tests/test_layout.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry_core import _SQL_XY, _points_xy, register
from arrow_supercluster_spark.session import register_views
from arrow_supercluster_spark.sources.layout import write_zordered_points
from arrow_supercluster_spark.sources.tables import read_table

# ===========================================================================
# Bucketed join
# ===========================================================================

@register(
    "q_bucketed_join",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           round(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q_bucketed_join(spark, sf_dir):
    """Warehouse layout — co-located fact-fact join: orders and lineitem
    bucketed+sorted by orderkey into catalog tables once, then joined
    with NO Exchange on either side (SortMergeJoin straight off the
    bucketed files — the zero-Exchange plan is gated in
    tests/test_batch36.py). At 100 TB this converts the every-query
    fact shuffle into a one-time write. The oracle joins the raw tables
    — same rows, different physical plan, which is the point."""
    base = tempfile.mkdtemp(prefix="bucketed_")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        tbl = f"b36_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        df = read_table(spark, sf_dir, name)
        (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", f"{base}/{tbl}")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(tbl)
        )
    o = spark.table("b36_orders")
    l = spark.table("b36_lineitem")
    # MERGE hint: at fixture scale Catalyst would broadcast the small side
    # (also shuffle-free, but it hides the bucketed layout); the hint keeps
    # the SortMergeJoin that the bucket alignment makes Exchange-free
    return (
        o.hint("merge").join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


# ===========================================================================
# SQL interface
# ===========================================================================

# ONE dialect-common string, executed verbatim by BOTH engines
_SQL_IFACE = """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           round(SUM(o.o_totalprice), 4) AS total,
           round(AVG(o.o_totalprice), 4) AS avg_price
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY c.c_mktsegment
"""


@register("q_sql_interface", _SQL_IFACE)
def q_sql_interface(spark, sf_dir):
    """SQL surface — the same ANSI string runs verbatim through
    `spark.sql()` over `register_views` (session.py — every testdata
    table as a temp view, events via the normalizing reader) and
    through the DuckDB oracle: the SQL-only consumer path, checked by
    construction. Views are lazy; the plan is identical to the
    DataFrame form (broadcast dim join + one agg)."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_IFACE)


# ===========================================================================
# Z-ordered scan
# ===========================================================================

_Z_ZOOM = 8
_Z_XRANGE = (10, 40)
_Z_YRANGE = (300, 380)


@register(
    "q_zorder_scan",
    f"""
    SELECT id, cell_x, cell_y FROM ({gc.sql_cells(_SQL_XY, _Z_ZOOM, OPTS)})
    WHERE cell_x BETWEEN {_Z_XRANGE[0]} AND {_Z_XRANGE[1]}
      AND cell_y BETWEEN {_Z_YRANGE[0]} AND {_Z_YRANGE[1]}
    """,
)
def q_zorder_scan(spark, sf_dir):
    """Storage layout — bbox scan over the Z-ORDERED point table: cells
    at zoom {z} written Morton-sorted with small row groups
    (sources/layout.py), then range-filtered. Content must equal the
    unordered relation (this oracle); the physical win — the majority
    of row groups skipped via column min/max stats — is proven in
    tests/test_layout.py and re-gated for this cell box in
    tests/test_batch36.py. This is the relational stand-in for the
    reference's KDBush range query at scale.""".format(z=_Z_ZOOM)
    cells = gc.with_cells(_points_xy(spark, sf_dir), _Z_ZOOM, OPTS)
    path = tempfile.mkdtemp(prefix="zorder_scan_") + "/pts"
    write_zordered_points(cells.select("id", "cell_x", "cell_y"), path)
    back = spark.read.parquet(path)
    return back.filter(
        F.col("cell_x").between(*_Z_XRANGE) & F.col("cell_y").between(*_Z_YRANGE)
    ).select("id", "cell_x", "cell_y")
