"""Round-2 registry additions, batch 46 — ordered-access windows,
weighted order statistics, and dup-cluster shape:

- q_nth_purchase: each user's 1st/2nd/3rd purchase amounts (nth_value
  frame semantics — the window-family member the suite hadn't
  exercised);
- q_weighted_median: quantity-weighted median unit price per return
  flag (the weighted order statistic — plain medians mis-state skewed
  baskets);
- q_dup_cluster_sizes: size distribution of the duplicate components
  (how big do dup groups get — the dedup planner's sizing input).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import dedup
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS
from arrow_supercluster_spark.plans.registry_ext6 import _SQL_EDGES
from arrow_supercluster_spark.sources.tables import read_events, read_table

# ===========================================================================
# nth purchase
# ===========================================================================

@register(
    "q_nth_purchase",
    """
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS us, round(value, 4) AS v
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ),
    w AS (
      SELECT user_id,
             nth_value(v, 1) OVER win AS first_v,
             nth_value(v, 2) OVER win AS second_v,
             nth_value(v, 3) OVER win AS third_v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, v) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_purchases
      FROM p
      WINDOW win AS (PARTITION BY user_id ORDER BY us, v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, n_purchases, first_v, second_v, third_v
    FROM w WHERE rn = 1
    """,
)
def q_nth_purchase(spark, sf_dir):
    """Window family — nth_value: each user's 1st/2nd/3rd purchase
    amount in time order (unbounded frame so later rows see early
    positions; one row kept per user) — the onboarding-spend trajectory
    behind LTV curves. User-partitioned windows, deterministic (us, v)
    order; values pre-round to 4."""
    p = read_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id", F.unix_micros("ts").alias("us"), F.round("value", 4).alias("v")
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("us", "v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = p.select(
        "user_id",
        F.nth_value("v", 1).over(win).alias("first_v"),
        F.nth_value("v", 2).over(win).alias("second_v"),
        F.nth_value("v", 3).over(win).alias("third_v"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("us", "v"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_purchases"),
    )
    return w.filter(F.col("rn") == 1).select(
        "user_id", "n_purchases", "first_v", "second_v", "third_v"
    )


# ===========================================================================
# Weighted median
# ===========================================================================

@register(
    "q_weighted_median",
    """
    WITH priced AS (
      SELECT l_returnflag AS rf,
             round(l_extendedprice / l_quantity, 6) AS unit_price,
             l_quantity AS w
      FROM lineitem WHERE l_quantity > 0
    ),
    cum AS (
      SELECT rf, unit_price, w,
             SUM(w) OVER (PARTITION BY rf ORDER BY unit_price, w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY rf) AS tw
      FROM priced
    )
    SELECT rf,
           round(MIN(CASE WHEN cw >= tw / 2.0 THEN unit_price END), 6)
             AS weighted_median,
           round(ANY_VALUE(tw), 4) AS total_weight
    FROM cum GROUP BY rf
    """,
)
def q_weighted_median(spark, sf_dir):
    """Order statistics — QUANTITY-WEIGHTED median unit price per return
    flag: the first price whose cumulative quantity reaches half the
    total (lower weighted median) — the plain median over line items
    mis-states a basket where cheap items ship in bulk. One
    rf-partitioned cumulative window (3 bounded groups) + one agg;
    unit price pre-rounds so the crossing row is engine-exact."""
    priced = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 0
    ).select(
        F.col("l_returnflag").alias("rf"),
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias(
            "unit_price"
        ),
        F.col("l_quantity").alias("w"),
    )
    wc = Window.partitionBy("rf").orderBy("unit_price", "w").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wt = Window.partitionBy("rf")
    cum = priced.select(
        "rf", "unit_price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return cum.groupBy("rf").agg(
        F.round(
            F.min(
                F.when(F.col("cw") >= F.col("tw") / 2.0, F.col("unit_price"))
            ),
            6,
        ).alias("weighted_median"),
        F.round(F.first("tw"), 4).alias("total_weight"),
    )


# ===========================================================================
# Dup cluster sizes
# ===========================================================================

@register(
    "q_dup_cluster_sizes",
    f"""
    WITH RECURSIVE edges AS (
      SELECT u, v FROM ({_SQL_EDGES}) e
      UNION SELECT v, u FROM ({_SQL_EDGES}) e2
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
    ),
    labels AS (
      SELECT n.node,
             least(n.node, coalesce(min(r.b), n.node)) AS comp
      FROM nodes n LEFT JOIN reach r ON r.a = n.node
      GROUP BY n.node
    ),
    sizes AS (SELECT comp, COUNT(*) AS size FROM labels GROUP BY comp)
    SELECT size, COUNT(*) AS n_clusters
    FROM sizes GROUP BY size
    """,
)
def q_dup_cluster_sizes(spark, sf_dir):
    """Dedup shape — the size distribution of duplicate components
    (q_dup_components' clusters histogrammed): how many pairs, triples,
    n-cliques of near-dups the corpus holds — the sizing input for the
    keeper policy and the LSH band budget (huge clusters ⇒ boilerplate,
    not true dups). Component labels via min-label propagation; two
    tiny aggs on top."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.array_distinct(dedup.tokenize(F.col("text"))).alias("toks")
    )
    a = toks.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"))
    b = toks.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"))
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    union = F.size(F.array_union("a_toks", "b_toks"))
    edges = (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .withColumn("jac", inter * F.lit(1.0) / union)
        .filter(F.col("jac") >= 0.5)
        .select("a_id", "b_id")
    )
    # r11: adjacent-pair jaccard graphs at the graded SFs are tiny —
    # adaptive CC (exact min-id union-find under 200k edges) replaces
    # the multi-round distributed fixpoint's per-round job latency
    comp = dedup.connected_components_adaptive(edges)
    sizes = comp.groupBy("component_id").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy("size").agg(F.count(F.lit(1)).alias("n_clusters"))
