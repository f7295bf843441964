"""Graph operators beyond connected components (dedup.py): PageRank.

Public algorithm (Brin & Page 1998), expressed relationally: rank
iteration = one join + one aggregate per round, driver-controlled like
the zoom recursion (SURVEY §3.1) and the components loop (dedup.py).

Scale shape (100 TB of edges):
- edges shuffle ONCE per iteration keyed by destination; ranks are
  |nodes| rows (small side → broadcastable when nodes ≪ edges);
- per-iteration results are localCheckpointed so the lineage stays
  O(1) instead of O(iterations) — the same discipline as the zoom loop;
- ranks round to 9 decimals each iteration: double summation order is
  partition-dependent, and without re-rounding the drift compounds
  across iterations (the cross-engine parity rationale of
  plans/registry.py's float discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list, fixed iteration count.
    Simplified dangling treatment (their mass is dropped, the common
    relational variant); uniform init 1/N. Returns (node, rank)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        # empty graph (e.g. a co-occurrence window that matched nothing)
        # → empty rank table, not a ZeroDivisionError at plan build
        return nodes.select("node", F.lit(0.0).alias("rank")).limit(0)
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("node", F.round(F.lit(1.0 / n), 9).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            edges.join(deg, src)
            .join(ranks, F.col(src) == F.col("node"))
            .select(F.col(dst).alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    base + damping * F.coalesce(F.col("inflow"), F.lit(0.0)), 9
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def undirected_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected edge set: (u, v) with u < v, distinct."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, n_tri) — number of triangles each node participates in.

    Classic two-join relational triangle enumeration (Cohen 2009,
    "Graph Twiddling in a MapReduce World"): canonical edges (u < v),
    wedges a<b<c from e(a,b) ⋈ e(b,c), closed by a semi-check against
    e(a,c). Each triangle is generated exactly once (ordered ids), then
    exploded to its three corners for the per-node count.

    Scale: both joins are equi-joins on a single node key — the shuffle
    unit is the edge list, never the wedge cross-product of a whole
    adjacency row. The worst-case wedge blowup concentrates on high-
    degree nodes; the production mitigation is degree-ordering (orient
    each edge from the lower-degree endpoint) which bounds wedges by
    arboricity — kept out of the checked kernel because the tie rules
    make the oracle needlessly brittle, noted here for the 100 TB path.
    """
    und = undirected_edges(edges, src, dst)
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(
        und,
        (wedges["a"] == und["u"]) & (wedges["c"] == und["v"]),
        "leftsemi",
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007, public algorithm), made DETERMINISTIC: each round every node
    adopts the most frequent label among its neighbors, ties broken by
    smallest label (the textbook random tie-break would not be
    reproducible across partitionings, let alone engines).

    Returns (node, label) after `iterations` synchronous rounds; labels
    start as the node's own id. Per round: one join keyed on the edge
    destination + one (src, label) agg + one bounded per-src window
    (frame = the node's distinct neighbor labels, degree-bounded) —
    edges shuffle once per round, labels are |nodes|-sized.
    localCheckpoint per round keeps lineage O(1).
    """
    from pyspark.sql import Window

    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("label", F.col("node"))
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    w = Window.partitionBy("e_src").orderBy(F.col("c").desc(), F.col("label"))
    for _ in range(iterations):
        cnt = (
            e.join(labels, e.e_dst == labels.node)
            .groupBy("e_src", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pick = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("e_src").alias("node"), F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node", F.coalesce("new_label", F.col("label")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
    return labels
