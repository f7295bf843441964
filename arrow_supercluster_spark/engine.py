"""ArrowClusterEngine — the session-layer analog of the reference engine
instance (SURVEY.md §3.3).

Mirrors the reference's public API surface
(packages/arrow-supercluster/src/arrow-cluster-engine.ts:14-19; README API
section): `load`, `get_clusters`, `get_children`, `get_leaves`,
`get_cluster_expansion_zoom`, `indexed_point_count` — re-expressed over a
persisted per-zoom node DataFrame instead of per-zoom KDBush trees.

Caching/invalidation follows the layer's rules
(arrow-cluster-layer.ts:46-55,84-118): rebuild only when data/options
change (load() is the rebuild), re-query per call; the node table is
persisted and partitioned by zoom so each query prunes 17/18 levels.

Cluster identity: grid nodes are identified by (zoom, cell_x, cell_y);
the reference's (origin<<5)+zoom+count bit packing is carried by the
greedy pipeline (operators/greedy.py), with the codec itself covered by
Q5 (q_clusterid_roundtrip).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS, ClusterOptions
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.operators.filters import bbox_predicate


class ArrowClusterEngine:
    """load(points) → query surface over the persisted hierarchy."""

    def __init__(
        self,
        spark: SparkSession,
        opts: ClusterOptions = DEFAULT_OPTIONS,
        workdir: Optional[str] = None,
    ):
        import tempfile

        self.spark = spark
        self.opts = opts
        self.workdir = workdir or tempfile.mkdtemp(prefix="arrow_supercluster_")
        self._nodes: Optional[DataFrame] = None
        self._points: Optional[DataFrame] = None
        self._indexed_count: Optional[int] = None

    # -- §3.1 load -------------------------------------------------------

    def load(self, points: DataFrame, mask=None) -> "ArrowClusterEngine":
        """Index build: mask (F1) → null-drop (F2) → project (P2/P4) →
        hierarchy checkpointed level-by-level to a zoom-partitioned parquet
        table under workdir (the engine-instance state; raw points are
        shuffled exactly once — see gc.materialize_hierarchy)."""
        pts = points.filter(mask) if mask is not None else points
        pts = gc.prepare_points(pts)
        self._points = pts
        self._nodes = gc.materialize_hierarchy(
            pts, f"{self.workdir}/hierarchy", self.opts, prepared=True
        )
        self._indexed_count = None
        return self

    def _require(self) -> DataFrame:
        if self._nodes is None:
            raise RuntimeError("call load() first")  # engine.ts throws similarly pre-load
        return self._nodes

    def append(self, points: DataFrame) -> "ArrowClusterEngine":
        """Incremental refresh: aggregate ONLY the new points to leaf
        cells, merge into the existing leaf via the leaf merge algebra
        (counts/sums add, mins min — gc.merge_leaf_aggregates), and
        re-derive the upper levels from the merged leaf. Old raw points
        are never rescanned: the cost is O(|new| + occupied cells),
        which is what keeps a 100 TB index refreshable. Writes the new
        hierarchy generation beside the old one (the old table is being
        read while the new one is written)."""
        pts = gc.prepare_points(points)
        new_leaf = gc.cell_agg(
            gc.with_cells(pts, self.opts.leaf_zoom, self.opts),
            self.opts.leaf_zoom,
        )
        old_leaf = self._require().filter(
            F.col("zoom") == self.opts.leaf_zoom
        ).select(*new_leaf.columns)
        merged = gc.merge_leaf_aggregates(old_leaf, new_leaf, self.opts)
        self._generation = getattr(self, "_generation", 0) + 1
        path = f"{self.workdir}/hierarchy_gen{self._generation}"
        self._nodes = gc.materialize_from_leaf(merged, path, self.opts)
        self._points = (
            self._points.unionByName(pts) if self._points is not None else pts
        )
        self._indexed_count = None
        return self

    @property
    def indexed_point_count(self) -> int:
        """A7 (arrow-cluster-engine.ts:49-53)."""
        if self._indexed_count is None:
            leaf = self._require().filter(F.col("zoom") == self.opts.leaf_zoom)
            self._indexed_count = (
                leaf.agg(F.sum("num_points")).collect()[0][0] or 0
            )
        return self._indexed_count

    # -- §3.2 getClusters ------------------------------------------------

    def _limit_zoom(self, zoom: int) -> int:
        """arrow-cluster-engine.ts:428-433."""
        return max(self.opts.min_zoom, min(int(zoom), self.opts.max_zoom + 1))

    def get_clusters(self, bbox, zoom: int) -> DataFrame:
        """Q1: bbox+zoom → ClusterOutput-shaped DataFrame. Partition
        pruning on zoom, then bbox on output positions (antimeridian
        handled inside bbox_predicate as an OR of ranges)."""
        z = self._limit_zoom(zoom)
        nodes = self._require().filter(F.col("zoom") == z)
        out = gc.finalize_clusters(nodes, self.opts)
        return out.filter(bbox_predicate(*bbox))

    # -- §3.3 drill-down -------------------------------------------------

    def get_children(self, zoom: int, cell_x: int, cell_y: int) -> DataFrame:
        """Q2: nodes at zoom+1 whose cell>>1 equals the given cell."""
        nodes = self._require().filter(F.col("zoom") == zoom + 1)
        return gc.finalize_clusters(
            nodes.filter(
                (F.floor(F.col("cell_x") / 2) == cell_x)
                & (F.floor(F.col("cell_y") / 2) == cell_y)
            ),
            self.opts,
        )

    def get_leaves(
        self, zoom: int, cell_x: int, cell_y: int,
        limit: Optional[int] = None, offset: int = 0,
    ) -> DataFrame:
        """Q3: member points of a node, paginated deterministically by id
        (the reference's DFS skip/limit, arrow-cluster-engine.ts:312-348).

        Scale shape (VERDICT r4 "What's wrong" #2): a zoom-0 cluster's
        leaf set is the whole corpus, so ranking it with a global
        `row_number` window funnels every member through one reducer.
        With a limit, the page is the rank-(offset, offset+limit] slice
        of the id order — `orderBy("id").limit(offset+limit)` compiles to
        TakeOrderedAndProject (distributed partial top-k), and the rank
        is then recovered on that ≤ offset+limit-row page by a bounded
        self-join count (rank of a prefix page = global rank). Without a
        limit the full leaf set is requested, so the rank comes from the
        distributed two-pass scan (functions/distrank.zip_scan) — no
        single-partition stage either way."""
        if self._points is None:
            raise RuntimeError("call load() first")
        pts = gc.with_cells(self._points, zoom, self.opts)
        leaves = pts.filter(
            (F.col("cell_x") == cell_x) & (F.col("cell_y") == cell_y)
        ).drop("cell_x", "cell_y", "x", "y")
        if limit is not None:
            hi = offset + limit
            page_ids = leaves.select("id").orderBy("id").limit(hi)
            ranks = (
                page_ids.join(
                    page_ids.select(F.col("id").alias("_id2")),
                    F.col("_id2") <= F.col("id"),
                )
                .groupBy("id")
                .agg(F.count(F.lit(1)).cast("int").alias("rank"))
            )
            # the page is ≤ offset+limit rows — broadcastable by design
            ranks = F.broadcast(ranks.filter(F.col("rank") > offset))
        else:
            from arrow_supercluster_spark.functions.distrank import zip_scan

            ranked0, _, _ = zip_scan(leaves.select("id"), ["id"], out="_r0")
            ranks = ranked0.select(
                "id", (F.col("_r0") + 1).cast("int").alias("rank")
            ).filter(F.col("rank") > offset)
        return leaves.join(ranks, "id")

    def get_cluster_expansion_zoom(self, zoom: int, cell_x: int, cell_y: int) -> int:
        """Q4 (arrow-cluster-engine.ts:240-256): first zoom > `zoom` where
        the node splits into >1 child. Single-pass union form (one job, one
        collect): the follow-the-single-child walk is equivalent to "first
        zoom whose descendant-cell count under the anchor exceeds 1" —
        while the chain is single, the descendant count IS 1. Descendancy
        is a shiftright of the (non-negative) cell coords, so each branch
        is a partition-pruned filter + count; no per-level driver trips.
        The count sequence is monotone over zoom for a nonempty anchor, so
        "first ≠ 1" (which also catches a nonexistent anchor cell: all
        counts 0 → returns zoom+1, like the walk) matches the reference."""
        nodes = self._require()
        parts = []
        for z in range(zoom + 1, self.opts.max_zoom + 2):
            shift = z - zoom
            parts.append(
                nodes.filter(F.col("zoom") == z)
                .filter(
                    (F.shiftright(F.col("cell_x"), shift) == cell_x)
                    & (F.shiftright(F.col("cell_y"), shift) == cell_y)
                )
                .agg(
                    F.lit(z).alias("z"),
                    F.count(F.lit(1)).alias("n_children"),
                )
            )
        splits = parts[0]
        for p in parts[1:]:
            splits = splits.unionByName(p)
        row = (
            splits.filter(F.col("n_children") != 1)
            .agg(F.min("z").alias("ez"))
            .collect()[0]
        )
        return int(row["ez"]) if row["ez"] is not None else self.opts.max_zoom + 1

    def get_descendants(self, zoom: int, cell_x: int, cell_y: int, max_depth_zoom: int) -> DataFrame:
        """J2: all nodes under (zoom,cell) down to max_depth_zoom —
        closed-form ancestor test, no recursion."""
        nodes = self._require().filter(
            (F.col("zoom") > zoom) & (F.col("zoom") <= max_depth_zoom)
        )
        shift = F.pow(F.lit(2.0), F.col("zoom") - zoom)
        return nodes.filter(
            (F.floor(F.col("cell_x") / shift) == cell_x)
            & (F.floor(F.col("cell_y") / shift) == cell_y)
        )

    def unload(self) -> None:
        self._nodes = None
        self._points = None
        self._indexed_count = None


class GreedyClusterEngine:
    """Full reference API over the GREEDY hierarchy — the reference-id
    interop engine (SURVEY §4 item 3): getClusters(bbox, zoom) plus
    getChildren / getLeaves / getClusterExpansionZoom keyed by the
    reference's (origin<<5)+zoom+count packed ids
    (arrow-cluster-engine.ts:126-256), answered from the materialized
    greedy table's per-zoom snapshots and parent pointers."""

    def __init__(
        self,
        spark: SparkSession,
        opts: ClusterOptions = DEFAULT_OPTIONS,
        workdir: Optional[str] = None,
    ):
        import tempfile

        self.spark = spark
        self.opts = opts
        self.workdir = workdir or tempfile.mkdtemp(prefix="ascs_greedy_")
        self._nodes: Optional[DataFrame] = None
        self._points: Optional[DataFrame] = None

    def load(
        self, points: DataFrame, mode: str = "exact", mask=None
    ) -> "GreedyClusterEngine":
        """mask: reference filterMask semantics — masked rows skip the
        index but still count toward the id-space salt (see
        greedy_hierarchy), so ids interoperate with a reference engine
        loaded with the same mask."""
        from arrow_supercluster_spark.operators.greedy import greedy_hierarchy

        path = f"{self.workdir}/nodes"
        greedy_hierarchy(points, self.opts, mode=mode, mask=mask).write.mode(
            "overwrite"
        ).parquet(path)
        self._nodes = self.spark.read.parquet(path)
        self._points = points if mask is None else points.filter(mask)
        return self

    def _require(self) -> DataFrame:
        if self._nodes is None:
            raise RuntimeError("call load() first")
        return self._nodes

    def _finalize(self, items: DataFrame) -> DataFrame:
        """ClusterOutput-shaped rows: clusters get inverse-Mercator
        centroids, singletons keep ORIGINAL coords bit-exactly via a join
        back to the loaded points (the no-trig fast path,
        arrow-cluster-engine.ts:175-180, 209-219)."""
        from arrow_supercluster_spark.functions import projection as proj

        orig = self._points.select(
            F.col("id").alias("_oid"),
            F.col("lng").alias("_olng"),
            F.col("lat").alias("_olat"),
        )
        out = items.join(orig, items["cluster_id"] == F.col("_oid"), "left")
        is_cluster = F.col("num_points") > F.lit(1)
        return out.select(
            F.col("cluster_id").alias("id"),
            F.col("num_points").alias("point_count"),
            is_cluster.alias("is_cluster"),
            F.when(is_cluster, proj.x_lng(F.col("x"))).otherwise(F.col("_olng")).alias("lng"),
            F.when(is_cluster, proj.y_lat(F.col("y"))).otherwise(F.col("_olat")).alias("lat"),
            "pos",
        )

    def get_clusters(self, bbox, zoom: int) -> DataFrame:
        """Q1 over the GREEDY hierarchy (arrow-cluster-engine.ts:126-193):
        clamp zoom, select that level's item snapshot (levels[z] ==
        treeData[z] — clusters formed at z plus pass-through items),
        finalize positions, then the normalized bbox filter on output
        coordinates (antimeridian = OR of ranges, Q6's relational form)."""
        from arrow_supercluster_spark.operators.filters import bbox_predicate

        z = max(self.opts.min_zoom, min(int(zoom), self.opts.max_zoom + 1))
        items = self._require().filter(F.col("zoom") == z)
        return self._finalize(items).filter(bbox_predicate(*bbox))

    def get_children(self, cluster_id: int) -> DataFrame:
        """Q2 keyed by packed cluster id (arrow-cluster-engine.ts:198-226)."""
        from arrow_supercluster_spark.operators.greedy_nav import greedy_children

        return self._finalize(greedy_children(self._require(), cluster_id))

    def get_leaves(
        self, cluster_id: int, limit: Optional[int] = None, offset: int = 0
    ) -> DataFrame:
        from arrow_supercluster_spark.operators.greedy_nav import greedy_leaves

        return greedy_leaves(
            self._require(), cluster_id,
            min_zoom=self.opts.min_zoom, leaf_zoom=self.opts.leaf_zoom,
            limit=limit, offset=offset,
        )

    def get_cluster_expansion_zoom(self, cluster_id: int) -> int:
        from arrow_supercluster_spark.operators.greedy_nav import (
            greedy_expansion_zoom,
        )

        row = greedy_expansion_zoom(self._require(), cluster_id).collect()[0]
        return int(row["expansion_zoom"])


WORLD_BBOX = (-180.0, -85.0, 180.0, 85.0)


class ClusterLayer:
    """Session-layer memoization over ArrowClusterEngine — the analog of
    the reference's deck.gl layer state machine
    (arrow-cluster-layer.ts:84-118, 294-303):

      * REBUILD (engine.load — the expensive path) only when the data
        reference actually changes, the filter mask changes, or a
        clustering option changes (:96-107 — dataActuallyChanged is an
        identity check, mirrored here with Python `is`);
      * RE-QUERY only when the engine was rebuilt or floor(zoom) moves
        to a new integer (:109-112) or the bbox changes (the reference
        layer pins bbox to the world viewport, :301);
      * otherwise serve the cached, already-collected output — zero new
        Spark jobs, like the reference serving `state.clusterOutput`.

    The cache holds COLLECTED rows (the reference caches the materialized
    output table, not a lazy query): cluster outputs at one zoom are
    screen-sized by construction, never corpus-sized."""

    def __init__(
        self,
        spark: SparkSession,
        opts: ClusterOptions = DEFAULT_OPTIONS,
        workdir: Optional[str] = None,
    ):
        self.spark = spark
        self._workdir = workdir
        self._opts = opts
        self._engine: Optional[ArrowClusterEngine] = None
        self._data: Optional[DataFrame] = None
        self._mask = None
        self._mask_repr: Optional[str] = None
        self._last_key = None
        self._output: Optional[list] = None

    def _rebuild(self, points: DataFrame, mask) -> None:
        self._engine = ArrowClusterEngine(
            self.spark, self._opts, self._workdir
        ).load(points, mask=mask)
        self._data = points
        self._mask = mask
        self._mask_repr = repr(mask) if mask is not None else None
        self._last_key = None  # engineChanged forces the next query

    def set_data(self, points: DataFrame, mask=None) -> "ClusterLayer":
        """Rebuild only if the DataFrame reference or mask changed
        (dataComparator + belt-and-suspenders identity check,
        arrow-cluster-layer.ts:51-55, 96-98)."""
        mask_repr = repr(mask) if mask is not None else None
        if points is not self._data or mask_repr != self._mask_repr:
            self._rebuild(points, mask)
        return self

    def set_options(self, opts: ClusterOptions) -> "ClusterLayer":
        """Config change → rebuild (arrow-cluster-engine rebuild props,
        arrow-cluster-layer.ts:99-106)."""
        if opts != self._opts:
            self._opts = opts
            if self._data is not None:
                # rebuild constructs a FRESH engine — the current mask
                # must ride along or masked points silently reappear
                self._rebuild(self._data, self._mask)
        return self

    def get_clusters(self, zoom: float, bbox=WORLD_BBOX) -> list:
        """Memoized Q1: returns the collected ClusterOutput rows; recomputes
        only on engine rebuild / integer-zoom change / bbox change."""
        if self._engine is None:
            raise RuntimeError("call set_data() first")
        import math as _math

        key = (int(_math.floor(zoom)), tuple(bbox))
        if key != self._last_key:
            self._output = self._engine.get_clusters(list(bbox), key[0]).collect()
            self._last_key = key
        return self._output
