"""Faithful greedy hierarchical clustering (SURVEY.md §2a A1 variant a,
§7 Phase 4).

Reimplements the SEMANTICS of the reference's `_cluster`
(packages/arrow-supercluster/src/arrow-cluster-engine.ts:354-416, zoom loop
:107-112) — insertion-order greedy radius clustering, Supercluster-exact:

  * per zoom z (top-down maxZoom→minZoom), radius r = radius/(extent·2^z)
    in Web-Mercator space over float32-rounded coords;
  * scan items in insertion order; skip items already visited at ≥ this
    zoom; gather unvisited neighbors within r (Euclidean);
  * cluster only if joined count exceeds the origin's own count AND meets
    minPoints; position = count-weighted mean; members get parent_id;
  * cluster id = (index_in_level << 5) + (zoom+1) + total_point_count
    (:378); otherwise the item (and, when it absorbed nothing but saw
    neighbors, each still-unvisited neighbor) passes through unchanged.

The greedy scan is order-dependent — NOT expressible relationally. It runs
as a pandas/numpy kernel inside `applyInPandas`:

  * `greedy_hierarchy(mode="exact")` — ONE group ⇒ the kernel sees all
    points in insertion order ⇒ bit-faithful to the single-threaded
    reference. This is the golden-parity mode; at 100 TB it is the wrong
    tool (single task) and exists because exactness is the contract.
  * `greedy_hierarchy(mode="partitioned")` — the scale path: points are
    partitioned by their grid cell at `partition_zoom` (coarse), each cell
    clustered independently in parallel. Clusters never span partition-cell
    boundaries (documented, deterministic divergence from the sequential
    order; results are invariant to executor count because the partition
    key is data-derived, not spark-partition-derived). Halo exchange would
    remove the boundary effect at the cost of cross-cell conflict
    resolution; the grid variant (grid_cluster.py) is our SQL-checked
    default surface, so partitioned-greedy is offered for
    Supercluster-compatible visual quality at scale.

Neighbor search: uniform grid binning at cell size r (the same
decomposition KDBush's within() bounds) — each point probes its 3×3
neighborhood; O(n) per level instead of O(n²).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from arrow_supercluster_spark.config import DEFAULT_OPTIONS, ClusterOptions

RESULT_SCHEMA = (
    "zoom int, cluster_id long, x double, y double, "
    "parent_id long, num_points long, pos long"
)


def _lng_x(lng: np.ndarray) -> np.ndarray:
    return np.float32(lng / 360.0 + 0.5).astype(np.float64)


def _lat_y(lat: np.ndarray) -> np.ndarray:
    s = np.sin(lat * math.pi / 180.0)
    y = 0.5 - 0.25 * np.log((1.0 + s) / (1.0 - s)) / math.pi
    y = np.clip(y, 0.0, 1.0)
    return np.float32(y).astype(np.float64)


def _neighbors_within(
    x: np.ndarray, y: np.ndarray, r: float
) -> "dict[tuple[int, int], np.ndarray]":
    """Uniform grid bins at cell size r → cell → member indices (sorted =
    insertion order within each bin)."""
    cx = np.floor(x / r).astype(np.int64)
    cy = np.floor(y / r).astype(np.int64)
    bins: dict[tuple[int, int], list[int]] = {}
    for i in range(len(x)):
        bins.setdefault((cx[i], cy[i]), []).append(i)
    return {k: np.asarray(v, dtype=np.int64) for k, v in bins.items()}, cx, cy


def greedy_cluster_kernel(
    x0: np.ndarray,
    y0: np.ndarray,
    ids0: np.ndarray,
    opts: ClusterOptions = DEFAULT_OPTIONS,
    total_points: int | None = None,
    group_salt: int | None = None,
) -> pd.DataFrame:
    """Run the full top-down zoom loop over one in-memory partition.

    Inputs are the float32-rounded Mercator coords and original point ids,
    in insertion order. Returns the per-zoom item table for zooms
    min_zoom..max_zoom+1 (leaf level included), parent pointers resolved.

    group_salt: when multiple kernel instances run in parallel
    (partitioned mode), the reference's index-based id encoding
    (arrow-cluster-engine.ts:378) collides across groups — per-group
    array indices repeat. The salt (the group's unique non-negative cell
    key) is packed into the high bits: cid = ((salt<<21 | index) << 5) +
    (zoom+1) + total — globally unique, still decodes zoom the
    reference's way. Requires salt < 2^33 and < 2^21 items per group.
    """
    if group_salt is not None and not (0 <= group_salt < (1 << 33)):
        raise ValueError(f"group_salt out of range: {group_salt}")

    def mk_pos(m: int) -> np.ndarray:
        """Row's index within its level array — the order the reference's
        KDBush scans children of one parent on small (≤nodeSize) levels,
        used for DFS-order getLeaves pagination (greedy_nav). Salted like
        cluster ids in partitioned mode (siblings share a salt, so the
        relative order within a parent is preserved)."""
        p = np.arange(m, dtype=np.int64)
        return p if group_salt is None else (group_salt << 21) | p
    n = len(x0)
    total = total_points if total_points is not None else n
    # level arrays (AoS equivalent, kept as parallel numpy arrays)
    x = x0.astype(np.float64).copy()
    y = y0.astype(np.float64).copy()
    ids = ids0.astype(np.int64).copy()
    parent = np.full(n, -1, dtype=np.int64)
    nump = np.ones(n, dtype=np.int64)
    visited = np.full(n, np.inf)  # zoom at which item was consumed

    levels: dict[int, pd.DataFrame] = {}
    leaf_zoom = opts.leaf_zoom

    for z in range(opts.max_zoom, opts.min_zoom - 1, -1):
        r = opts.radius / (opts.extent * (2.0**z))
        r2 = r * r
        m = len(x)
        bins, bcx, bcy = _neighbors_within(x, y, r)

        nx: list[float] = []
        ny: list[float] = []
        nids: list[int] = []
        nnum: list[int] = []

        # one concatenated 3×3-neighborhood candidate array per occupied
        # cell (shared by all points in the cell) — keeps the greedy scan
        # itself O(n) with vectorized distance checks
        hood_cache: dict[tuple[int, int], np.ndarray] = {}

        def hood(cell: tuple[int, int]) -> np.ndarray:
            got = hood_cache.get(cell)
            if got is None:
                parts = [
                    bins[c]
                    for c in (
                        (cell[0] + dxc, cell[1] + dyc)
                        for dxc in (-1, 0, 1)
                        for dyc in (-1, 0, 1)
                    )
                    if c in bins
                ]
                got = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
                hood_cache[cell] = got
            return got

        for i in range(m):
            if visited[i] <= z:
                continue
            visited[i] = z

            xi, yi = x[i], y[i]
            cand = hood((bcx[i], bcy[i]))
            dx = x[cand] - xi
            dy = y[cand] - yi
            neigh = cand[(dx * dx + dy * dy <= r2) & (cand != i)]

            n_origin = nump[i]
            n_total = n_origin
            for k in neigh:
                if visited[k] > z:
                    n_total += nump[k]

            if n_total > n_origin and n_total >= opts.min_points:
                wx = xi * n_origin
                wy = yi * n_origin
                origin_key = i if group_salt is None else (group_salt << 21) | i
                cid = (origin_key << 5) + (z + 1) + total
                for k in neigh:
                    if visited[k] <= z:
                        continue
                    visited[k] = z
                    wx += x[k] * nump[k]
                    wy += y[k] * nump[k]
                    parent[k] = cid
                parent[i] = cid
                nx.append(wx / n_total)
                ny.append(wy / n_total)
                nids.append(cid)
                nnum.append(int(n_total))
            else:
                nx.append(xi)
                ny.append(yi)
                nids.append(int(ids[i]))
                nnum.append(int(nump[i]))
                if n_total > 1:
                    for k in neigh:
                        if visited[k] <= z:
                            continue
                        visited[k] = z
                        nx.append(x[k])
                        ny.append(y[k])
                        nids.append(int(ids[k]))
                        nnum.append(int(nump[k]))

        # snapshot the CONSUMED level (z+1) now that its parent pointers
        # are final
        levels[z + 1] = pd.DataFrame(
            {
                "zoom": np.int32(z + 1),
                "cluster_id": ids,
                "x": x,
                "y": y,
                "parent_id": parent,
                "num_points": nump,
                "pos": mk_pos(len(x)),
            }
        )
        x = np.asarray(nx)
        y = np.asarray(ny)
        ids = np.asarray(nids, dtype=np.int64)
        nump = np.asarray(nnum, dtype=np.int64)
        parent = np.full(len(nx), -1, dtype=np.int64)
        visited = np.full(len(nx), np.inf)

    levels[opts.min_zoom] = pd.DataFrame(
        {
            "zoom": np.int32(opts.min_zoom),
            "cluster_id": ids,
            "x": x,
            "y": y,
            "parent_id": parent,
            "num_points": nump,
            "pos": mk_pos(len(x)),
        }
    )
    out = pd.concat(
        [levels[z] for z in range(opts.min_zoom, leaf_zoom + 1)],
        ignore_index=True,
    )
    return out.astype(
        {
            "zoom": "int32",
            "cluster_id": "int64",
            "x": "float64",
            "y": "float64",
            "parent_id": "int64",
            "num_points": "int64",
            "pos": "int64",
        }
    )


def greedy_hierarchy(
    points,
    opts: ClusterOptions = DEFAULT_OPTIONS,
    mode: str = "exact",
    partition_zoom: int = 3,
):
    """Spark operator: points (id, lng, lat — nulls already dropped or will
    be dropped here) → per-zoom greedy item table.

    mode="exact": single-group applyInPandas, bit-faithful to the
    sequential reference (golden-parity mode; not for 100 TB).
    mode="partitioned": group by coarse grid cell at `partition_zoom` —
    embarrassingly parallel, deterministic, clusters bounded by cell walls.
    """
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.operators.filters import drop_null_geometry
    from arrow_supercluster_spark.functions.projection import fround, lat_y, lng_x

    # The reference encodes this.numPoints = table.numRows BEFORE the
    # null/mask filtering (arrow-cluster-engine.ts:64,378), so cluster ids
    # must be salted with the PRE-drop row count or they diverge from
    # reference-produced ids on inputs containing null geometry. Callers
    # applying a filter mask should do so via the mask contract AFTER this
    # operator's id space is fixed — i.e. rows the reference would count
    # (masked rows included) must still be present in `points` here.
    total = points.count()
    pts = (
        drop_null_geometry(points)
        .select(
            "id",
            fround(lng_x(F.col("lng"))).alias("x"),
            fround(lat_y(F.col("lat"))).alias("y"),
        )
    )

    def run_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort")  # insertion order
        return greedy_cluster_kernel(
            pdf["x"].to_numpy(),
            pdf["y"].to_numpy(),
            pdf["id"].to_numpy(),
            opts,
            total_points=total,
            # per-group array indices collide across parallel groups; the
            # group's unique cell key salts the id's high bits
            group_salt=None if mode == "exact" else int(key[0]),
        )

    if mode == "exact":
        grouped = pts.withColumn("g", F.lit(0)).groupBy("g")
    elif mode == "partitioned":
        scale = opts.cell_scale(partition_zoom)
        grouped = pts.withColumn(
            "g",
            F.floor(F.col("x") * F.lit(scale)) * F.lit(1_000_003)
            + F.floor(F.col("y") * F.lit(scale)),
        ).groupBy("g")
    else:
        raise ValueError(f"unknown mode {mode!r}")

    return grouped.applyInPandas(run_group, schema=RESULT_SCHEMA)
