"""Round-2 registry additions: WKB geometry decode (P1 completion) and
packed-cluster-id drill-down over the greedy hierarchy (SURVEY §4 item 3).

WKB: the reference reads non-GeoArrow geometry encodings through a
per-row fallback (arrow-helpers.ts:52-62); real-world GeoParquet is WKB.
The decode here is the expression-only decoder from functions/wkb.py.

Greedy drill-down: the query callable materializes the exact-mode greedy
table to a fixed parquet path; the DuckDB oracle reads the SAME table and
answers with plain SQL / a recursive CTE — so Spark's pointer-walk
navigation is checked against an independent relational derivation over
identical input (the pattern the reference itself uses: differential
testing query-by-query, engine.test.ts:10-131). The harness collects the
Spark side first (tests/oracle_harness.compare), so the table exists by
the time the oracle SQL runs.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.functions.wkb import (
    decode_wkb_points,
    encode_wkb_point_udf,
)
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points


@register(
    "q_unpack_wkb",
    f"SELECT id, lng, lat FROM ({SQL_POINTS}) WHERE lng IS NOT NULL",
)
def q_unpack_wkb(spark, sf_dir):
    """P1 (WKB fallback) — points are packed into little-endian WKB Point
    binaries (struct.pack scaffolding, independent of the decoder) and
    decoded back with the JVM-expression decoder; the oracle is the plain
    coordinates, so the match proves the decode is bit-exact
    (arrow-helpers.ts:52-62)."""
    pts = derived_points(spark, sf_dir).filter(F.col("lng").isNotNull())
    enc = encode_wkb_point_udf()
    wkb_df = pts.select("id", enc(F.col("lng"), F.col("lat")).alias("geometry"))
    return decode_wkb_points(wkb_df).select("id", "lng", "lat")


# ===========================================================================
# Packed-cluster-id drill-down (greedy hierarchy)
# ===========================================================================

# pid-scoped: concurrent test shards (tools/shard_tests.py) each
# memoize their own copy — a shared fixed path races (one process
# overwrites while another reads).  The SQL twin strings below are
# built from this constant at import, so both engines stay aligned.
GREEDY_PATH = f"/tmp/ascs_greedy_nodes_{os.getpid()}"
_GREEDY_TBL = f"read_parquet('{GREEDY_PATH}/*.parquet')"
_LAST_SF: str | None = None

# anchor: the biggest root-level cluster, ties broken by id — identical,
# trivially deterministic selection on both engines
_SQL_ANCHOR = f"""(
  SELECT cluster_id FROM {_GREEDY_TBL}
  WHERE zoom = {OPTS.min_zoom} AND num_points > 1
  ORDER BY num_points DESC, cluster_id LIMIT 1
)"""


def _greedy_nodes(spark, sf_dir):
    """Materialize (once per sf) the exact-mode greedy table both engines
    read. Exact mode is the id-faithful single-task golden path — right
    for a differential fixture, not the 100 TB path (greedy.py:22-25)."""
    global _LAST_SF
    from arrow_supercluster_spark.operators.greedy import greedy_hierarchy

    if _LAST_SF != sf_dir:
        greedy_hierarchy(
            derived_points(spark, sf_dir), OPTS, mode="exact"
        ).write.mode("overwrite").parquet(GREEDY_PATH)
        _LAST_SF = sf_dir
    return spark.read.parquet(GREEDY_PATH)


def _greedy_anchor_id(spark, sf_dir) -> int:
    nodes = _greedy_nodes(spark, sf_dir)
    return (
        nodes.filter((F.col("zoom") == OPTS.min_zoom) & (F.col("num_points") > 1))
        .orderBy(F.desc("num_points"), F.asc("cluster_id"))
        .limit(1)
        .collect()[0]["cluster_id"]
    )


@register(
    "q_greedy_children",
    f"""
    SELECT c.zoom, c.cluster_id, c.num_points, c.pos,
           c.num_points > 1 AS is_cluster,
           round(c.x, 7) AS x, round(c.y, 7) AS y
    FROM {_GREEDY_TBL} c
    WHERE c.parent_id = {_SQL_ANCHOR}
    """,
)
def q_greedy_children(spark, sf_dir):
    """Q2 by packed cluster id (arrow-cluster-engine.ts:198-226): children
    of the anchor cluster via parent pointers; the reference's
    within-radius search at origin zoom is index acceleration for the
    same parentId == clusterId predicate (:275-302)."""
    from arrow_supercluster_spark.operators.greedy_nav import greedy_children

    nodes = _greedy_nodes(spark, sf_dir)
    cid = _greedy_anchor_id(spark, sf_dir)
    return greedy_children(nodes, cid).select(
        "zoom", "cluster_id", "num_points", "pos",
        (F.col("num_points") > 1).alias("is_cluster"),
        F.round("x", 7).alias("x"),
        F.round("y", 7).alias("y"),
    )


@register(
    "q_greedy_leaves",
    f"""
    WITH RECURSIVE walk AS (
      SELECT c.cluster_id, c.num_points,
             lpad(CAST(c.pos AS VARCHAR), 19, '0') AS path
      FROM {_GREEDY_TBL} c WHERE c.parent_id = {_SQL_ANCHOR}
      UNION ALL
      SELECT c.cluster_id, c.num_points,
             w.path || lpad(CAST(c.pos AS VARCHAR), 19, '0')
      FROM {_GREEDY_TBL} c JOIN walk w ON c.parent_id = w.cluster_id
      WHERE w.num_points > 1
    ),
    leaves AS (
      SELECT cluster_id AS id,
             row_number() OVER (ORDER BY path) AS rank
      FROM walk WHERE num_points = 1
    )
    SELECT rank, id FROM leaves WHERE rank BETWEEN 3 AND 12
    """,
)
def q_greedy_leaves(spark, sf_dir):
    """Q3 by packed cluster id, DFS-order pagination
    (arrow-cluster-engine.ts:231-235, 312-348): Spark walks the hierarchy
    as ≤18 broadcast level-joins building fixed-width pos paths; the
    oracle re-derives the same order with a recursive CTE. offset=2,
    limit=10 (mirrors q_get_leaves)."""
    from arrow_supercluster_spark.operators.greedy_nav import greedy_leaves

    nodes = _greedy_nodes(spark, sf_dir)
    cid = _greedy_anchor_id(spark, sf_dir)
    return greedy_leaves(
        nodes, cid,
        min_zoom=OPTS.min_zoom, leaf_zoom=OPTS.leaf_zoom,
        limit=10, offset=2,
    )


@register(
    "q_greedy_expansion",
    f"""
    SELECT min(c.zoom) AS expansion_zoom
    FROM {_GREEDY_TBL} c WHERE c.parent_id = {_SQL_ANCHOR}
    """,
)
def q_greedy_expansion(spark, sf_dir):
    """Q4 by packed cluster id (arrow-cluster-engine.ts:240-256). Spark
    derives the split zoom from the anchor's own rows (deepest occurrence
    + 1 = origin zoom); the oracle derives it from the children's rows
    via parent pointers — two independent derivations of the same
    quantity."""
    nodes = _greedy_nodes(spark, sf_dir)
    cid = _greedy_anchor_id(spark, sf_dir)
    return (
        nodes.filter(F.col("cluster_id") == cid)
        .agg((F.max("zoom") + 1).alias("expansion_zoom"))
    )


@register("q_embedding_neardup_lsh", None)
def q_embedding_neardup_lsh(spark, sf_dir):
    """E2 scale path — embedding near-dup pairs via multi-table sign-LSH
    candidate generation + exact cosine verify (similarity.neardup_pairs_lsh).
    THIS, not the all-pairs oracle form q_embedding_neardup, is the
    production entry at 100 TB: equi-joins only, pairs shuffled bare.
    Rows-only (LSH recall is probabilistic); precision and recall are
    asserted in tests/test_similarity.py against the exact pair set."""
    from arrow_supercluster_spark.operators.similarity import neardup_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # 0.45 for the same reason as q_embedding_neardup: the synthetic
    # embeddings are near-orthogonal, 0.9 matches nothing
    # wider tables (4 planes x 8) so the near-orthogonal corpus's true
    # pairs actually collide: recall ~0.8 at cos 0.45 vs ~0.1 with the
    # default 8x4 geometry tuned for 0.9-similarity corpora
    return neardup_pairs_lsh(emb, threshold=0.45, n_planes=4, n_tables=8)
