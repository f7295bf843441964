"""Round-2 registry additions, batch 43 — privacy and join-health
governance:

- q_k_anonymity: equivalence-class sizes for the (mktsegment, nation)
  quasi-identifier over customers — the re-identification audit;
- q_l_diversity: distinct sensitive values (account-balance band) per
  QI class — the homogeneity-attack audit on top of k-anonymity;
- q_join_fanout: key-multiplicity profile of the orders⋈lineitem join
  — the fan-out / skew health check every pipeline join needs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_table

_K_THRESHOLD = 5


@register(
    "q_k_anonymity",
    f"""
    WITH classes AS (
      SELECT c.c_mktsegment, n.n_name AS nation, COUNT(*) AS k
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, nation, k,
           CAST(k < {_K_THRESHOLD} AS INTEGER) AS below_k
    FROM classes
    """,
)
def q_k_anonymity(spark, sf_dir):
    """Governance — k-anonymity audit (Sweeney 2002): equivalence-class
    sizes for the quasi-identifier (market segment, nation) over
    customers; classes with k < {k} are re-identification risks that a
    release would need to generalize or suppress. One broadcast dim
    join + one QI-keyed agg — at 100 TB this is the same one-shuffle
    shape as any group-by; the QI table is |segments|×|nations|
    bounded.""".format(k=_K_THRESHOLD)
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    classes = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment", F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return classes.select(
        "c_mktsegment", "nation", "k",
        (F.col("k") < _K_THRESHOLD).cast("int").alias("below_k"),
    )


@register(
    "q_l_diversity",
    """
    WITH banded AS (
      SELECT c.c_mktsegment, n.n_name AS nation,
             CAST(floor(c.c_acctbal / 2000.0) AS BIGINT) AS bal_band
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT c_mktsegment, nation,
           COUNT(*) AS k,
           COUNT(DISTINCT bal_band) AS l,
           CAST(COUNT(DISTINCT bal_band) < 3 AS INTEGER) AS below_l
    FROM banded GROUP BY 1, 2
    """,
)
def q_l_diversity(spark, sf_dir):
    """Governance — l-diversity (Machanavajjhala 2007) on top of the
    k-anonymity classes: the number of DISTINCT sensitive values
    (account-balance band, 2000-wide) per QI class — a class can be
    k-large yet leak everything if all members share one sensitive
    value (the homogeneity attack). Same one-shuffle shape with a
    distinct-count; l < 3 flags."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    banded = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_mktsegment",
        F.col("n_name").alias("nation"),
        F.floor(F.col("c_acctbal") / 2000.0).cast("long").alias("bal_band"),
    )
    return banded.groupBy("c_mktsegment", "nation").agg(
        F.count(F.lit(1)).alias("k"),
        F.countDistinct("bal_band").alias("l"),
        (F.countDistinct("bal_band") < 3).cast("int").alias("below_l"),
    )


@register(
    "q_join_fanout",
    """
    WITH mult AS (
      SELECT o.o_orderkey,
             COUNT(l.l_orderkey) AS fanout
      FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    )
    SELECT COUNT(*) AS n_keys,
           SUM(CASE WHEN fanout = 0 THEN 1 ELSE 0 END) AS n_childless,
           MIN(fanout) AS min_fanout,
           MAX(fanout) AS max_fanout,
           round(AVG(fanout), 6) AS avg_fanout,
           round(quantile_cont(fanout, 0.99), 6) AS p99_fanout
    FROM mult
    """,
)
def q_join_fanout(spark, sf_dir):
    """Join health — fan-out profile of orders⋈lineitem: per-key child
    multiplicity (childless parents included via the left join), its
    min/max/avg/p99 — the audit that catches accidental many-to-many
    blowups and the skewed keys that motivate salting (functions/
    skew.py) BEFORE a 100 TB join runs. One key-collapse agg + one
    summary agg; the percentile runs on |orderkeys| collapsed rows."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    mult = (
        o.join(l, l.l_orderkey == o.o_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("fanout"))
    )
    return mult.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("fanout") == 0).cast("int")).alias("n_childless"),
        F.min("fanout").alias("min_fanout"),
        F.max("fanout").alias("max_fanout"),
        F.round(F.avg("fanout"), 6).alias("avg_fanout"),
        F.round(F.expr("percentile(fanout, 0.99)"), 6).alias("p99_fanout"),
    )
