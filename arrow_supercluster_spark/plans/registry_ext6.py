"""Registry entries: duplicate-group connected components (graph
resolution) and cardinality sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import dedup
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS


_J_THRESH = 0.5

_SQL_EDGES = f"""
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM (SELECT doc_id, list_distinct({SQL_TOKS}) AS toks FROM documents) a
  JOIN (SELECT doc_id, list_distinct({SQL_TOKS}) AS toks FROM documents) b
    ON b.doc_id = a.doc_id + 1
  WHERE len(list_intersect(a.toks, b.toks)) * 1.0
        / len(list_distinct(list_concat(a.toks, b.toks))) >= {_J_THRESH}
"""


@register(
    "q_dup_components",
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
    )
    SELECT n.node AS node_id,
           least(n.node, coalesce(min(r.b), n.node)) AS component_id
    FROM nodes n LEFT JOIN reach r ON r.a = n.node
    GROUP BY n.node
    """,
)
def q_dup_components(spark, sf_dir):
    """Duplicate-group resolution — connected components over a similarity
    edge list (edges: adjacent doc ids with unigram Jaccard ≥ 0.5, chosen
    because the edge set itself is oracle-computable). Spark side:
    alternating min-label propagation, one shuffle per round, O(log n)
    rounds (operators/dedup.connected_components). Oracle: DuckDB
    recursive transitive closure — same components, radically different
    algorithm, which is exactly what makes the check strong."""
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
        .filter(F.col("jac") >= _J_THRESH)
        .select("a_id", "b_id")
    )
    # r11: adaptive CC — identical (node_id, component_id = min id)
    # frame, union-find driver-side under 200k edges, distributed above
    return dedup.connected_components_adaptive(edges)


@register("q_approx_distinct", None)
def q_approx_distinct(spark, sf_dir):
    """Cardinality sketch — HyperLogLog++ approx distinct users per event
    type (rows-only: sketch estimates are engine-specific; accuracy vs
    exact asserted in tests/test_sketches.py)."""
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )
