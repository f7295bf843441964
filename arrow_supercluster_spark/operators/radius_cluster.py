"""Relational radius clustering — A1 variant (c): TRUE within-radius
clustering (Euclidean r-ball, like the reference's KDBush search — not the
grid-cell approximation) expressed entirely in joins/aggregates, so it is
deterministic, parallel, AND oracle-checkable in SQL.

Semantics ("min-order-neighbor" clustering; a relational projection of the
reference's insertion-order greedy, arrow-cluster-engine.ts:354-416):

  1. For each item p, N(p) = items within Euclidean r (including p),
     r = radius/(extent·2^zoom) in Mercator space (:356).
  2. origin(p) = the minimum-order item of N(p) (order = id; the greedy
     scan would reach it first).
  3. An item o is a VALID origin iff origin(o) = o (no earlier item would
     have absorbed it — exactly greedy's "not already visited" test).
  4. p joins the cluster of its minimum-order VALID neighbor; items with
     no valid neighbor, and members of groups below min_points, pass
     through as singletons.
  5. Cluster position = count-weighted mean of members (A2); counts sum
     (A3).

Where it matches greedy exactly: whenever clusters don't chain (no member
of a cluster is within r of a different, earlier origin) — the common
case. Where it deviates: greedy's cascading availability (an item freed
because its would-be origin was absorbed) — a sequential-scan effect no
bounded-round parallel algorithm reproduces; this variant resolves those
items deterministically to their next valid origin or passthrough.

Execution shape (the 100 TB story): items get a cell key at size exactly
r; the candidate join is an equi-join on the 3×3 neighbor cells (the
relational KDBush range query, SURVEY §1.1 spatial-index row) followed by
the exact distance predicate; then two hash aggregations (argmin origin,
cluster rollup) and one self-join for validity. No Python, no recursion,
no driver data. Per-level input of the hierarchy loop is the previous
level's clusters (exponentially shrinking), so pair fan-out stays bounded
even at low zooms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS, ClusterOptions


def _neighbor_pairs(items: DataFrame, r: float, right_items: DataFrame | None = None) -> DataFrame:
    """(a_id, a_ord, b_id …) pairs with dist ≤ r via 3×3 cell equi-join.

    Each left item is replicated into its 9 neighbor cells (explode of a
    constant 3×3 offset array — a narrow map), then equi-joined against
    right items on the cell key: the relational form of a KDBush
    within() query. Both sides shuffle once on the cell key.

    `right_items` (default: the left side) lets a caller restrict the
    candidate set to a subset of items.  (radius_cluster_level used this
    in r10 for its assignment pass; r11 replaced that second neighbor
    join with a semi-join on the first derivation's pair table — see the
    step-4 note there — so the parameter is now API surface for external
    callers only.)"""
    if right_items is None:
        right_items = items
    cx = F.floor(F.col("x") / F.lit(r))
    cy = F.floor(F.col("y") / F.lit(r))
    right = right_items.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("b_x"),
        F.col("y").alias("b_y"),
        F.col("num_points").alias("b_num"),
        cx.alias("b_cx"),
        cy.alias("b_cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    left = (
        items.select(
            F.col("id").alias("a_id"),
            F.col("x").alias("a_x"),
            F.col("y").alias("a_y"),
            cx.alias("a_cx"),
            cy.alias("a_cy"),
        )
        .withColumn("off", F.explode(offsets))
        .select(
            "a_id", "a_x", "a_y",
            (F.col("a_cx") + F.col("off.dx")).alias("b_cx"),
            (F.col("a_cy") + F.col("off.dy")).alias("b_cy"),
        )
    )
    dx = F.col("a_x") - F.col("b_x")
    dy = F.col("a_y") - F.col("b_y")
    return left.join(right, ["b_cx", "b_cy"]).filter(
        dx * dx + dy * dy <= F.lit(r * r)
    )


def radius_cluster_level(
    items: DataFrame, zoom: int, opts: ClusterOptions = DEFAULT_OPTIONS
) -> DataFrame:
    """One clustering level: items (id, x, y, num_points) → clusters/
    passthroughs at `zoom` with schema (id, x, y, num_points, is_cluster,
    origin of id = min member id for clusters)."""
    r = opts.radius / (opts.extent * float(2**zoom))
    pairs = _neighbor_pairs(items, r).select("a_id", "b_id")

    # step 2: origin(p) = min-order neighbor
    origin = pairs.groupBy("a_id").agg(F.min("b_id").alias("origin_id"))
    # step 3: valid origins
    valid = origin.filter(F.col("a_id") == F.col("origin_id")).select(
        F.col("a_id").alias("valid_id")
    )
    # step 4: p → min-order VALID neighbor (or none).  r11 (VERDICT r10
    # "Next round" #5): ONE pair derivation per level.  The r10 form ran
    # the 9-cell explode+join a SECOND time with the right side
    # restricted to valid origins; the assignment pair set is instead
    # the already-derived `pairs` semi-joined to the valid set on b_id —
    # Spark's exchange reuse computes the pair join's shuffles once (the
    # two subtrees are identical), and the semi-join's right side reuses
    # origin's aggregation partitioning.  Alternated A/B over the full
    # 17-level hierarchy at sf0.1 (tools/radius_ab.py): 26.7/24.0 s →
    # 23.1/23.5 s, output exactly identical (exceptAll = 0 both ways).
    # Eagerly checkpointing `pairs` instead was measured SLOWER (30-33 s
    # — one extra job per level, the same shape r10 reverted for
    # members/grouped truncates).
    assign = (
        pairs.join(valid, pairs.b_id == valid.valid_id, "leftsemi")
        .groupBy("a_id")
        .agg(F.min("b_id").alias("cluster_id"))
    )
    members = (
        items.join(assign, items.id == assign.a_id, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "id"))
    )
    # step 5: rollup per cluster; dissolve groups below min_points back to
    # singletons (pass through unchanged)
    grouped = members.groupBy("cluster_id").agg(
        F.sum("num_points").alias("num_points"),
        F.sum(F.col("x") * F.col("num_points")).alias("wx"),
        F.sum(F.col("y") * F.col("num_points")).alias("wy"),
        F.count(F.lit(1)).alias("n_members"),
    )
    clusters = grouped.filter(
        (F.col("n_members") > 1) & (F.col("num_points") >= opts.min_points)
    ).select(
        F.col("cluster_id").alias("id"),
        (F.col("wx") / F.col("num_points")).alias("x"),
        (F.col("wy") / F.col("num_points")).alias("y"),
        "num_points",
        F.lit(True).alias("is_cluster"),
    )
    dissolved = grouped.filter(
        ~((F.col("n_members") > 1) & (F.col("num_points") >= opts.min_points))
    ).select(F.col("cluster_id").alias("d_id"))
    singles = (
        members.join(dissolved, members.cluster_id == dissolved.d_id, "leftsemi")
        .select("id", "x", "y", "num_points", (F.col("num_points") > 1).alias("is_cluster"))
    )
    return clusters.unionByName(singles)


def radius_hierarchy(
    points_xy: DataFrame, opts: ClusterOptions = DEFAULT_OPTIONS
) -> DataFrame:
    """Full top-down hierarchy with the relational radius kernel: level z
    consumes level z+1's output (driver loop, localCheckpoint per level to
    keep lineage flat). Returns union with a zoom column (zoom of the
    level the items appear at, leaf_zoom..min_zoom)."""
    items = points_xy.select(
        "id", "x", "y", F.lit(1).cast("long").alias("num_points")
    ).localCheckpoint()
    levels = [
        items.select(
            F.lit(opts.leaf_zoom).alias("zoom"), "id", "x", "y", "num_points",
            (F.col("num_points") > 1).alias("is_cluster"),
        )
    ]

    # r11 (VERDICT r10 "Next round" #5, guide §2.6 latency): a level
    # whose radius is below the corpus's minimum pairwise distance is an
    # exact NO-OP — pairs contains only self-pairs, every item passes
    # through unchanged (same id/x/y/num_points; is_cluster re-derived
    # as num_points > 1, which is what the passthrough branch emits
    # too), so the full kernel (9-cell join + 4 aggregations + one
    # checkpoint job per level) computes nothing.  Find d²min once with
    # a doubling probe — the 3×3 cell join at cell size r captures EVERY
    # pair within r, so the first non-NULL min is the exact global
    # minimum — and emit the leading run of levels with r(z)² < d²min as
    # passthroughs.  At zoom ranges finer than the data resolution this
    # removes half the hierarchy's jobs; on dense data the first probe
    # (max_zoom) finds a pair immediately and costs one narrow join+agg.
    # The probe is a 1-row agg collect (gate-allowlisted: ≤ ceil(17/3)
    # single-row probes per hierarchy).
    d2min = None
    probe_zs = list(range(opts.max_zoom, opts.min_zoom - 1, -3))
    if probe_zs[-1] != opts.min_zoom:
        # always probe the coarsest level: d²min=None must certify that
        # even the LARGEST radius pairs nothing
        probe_zs.append(opts.min_zoom)
    for probe_z in probe_zs:
        r = opts.radius / (opts.extent * float(2**probe_z))
        row = (
            _neighbor_pairs(items, r)
            .filter(F.col("a_id") != F.col("b_id"))
            .agg(
                F.min(
                    (F.col("a_x") - F.col("b_x"))
                    * (F.col("a_x") - F.col("b_x"))
                    + (F.col("a_y") - F.col("b_y"))
                    * (F.col("a_y") - F.col("b_y"))
                ).alias("d2")
            )
            .collect()[0]
        )
        if row[0] is not None:
            d2min = float(row[0])
            break
    first_real = None
    if d2min is not None:
        for z in range(opts.max_zoom, opts.min_zoom - 1, -1):
            r = opts.radius / (opts.extent * float(2**z))
            if r * r >= d2min:
                first_real = z
                break

    cur = items
    for z in range(opts.max_zoom, opts.min_zoom - 1, -1):
        if first_real is None or z > first_real:
            # exact no-op level: passthrough (identical to what the
            # kernel emits when pairs has only self-pairs)
            levels.append(
                cur.select(
                    F.lit(z).alias("zoom"), "id", "x", "y", "num_points",
                    (F.col("num_points") > 1).alias("is_cluster"),
                )
            )
            continue
        out = radius_cluster_level(cur, z, opts).localCheckpoint()
        levels.append(
            out.select(F.lit(z).alias("zoom"), "id", "x", "y", "num_points", "is_cluster")
        )
        cur = out.select("id", "x", "y", "num_points")
    result = levels[0]
    for lv in levels[1:]:
        result = result.unionByName(lv)
    return result


# ---------------------------------------------------------------------------
# SQL twin (DuckDB oracle) for one level over raw points
# ---------------------------------------------------------------------------

def sql_radius_cluster(points_xy_sql: str, zoom: int, opts: ClusterOptions = DEFAULT_OPTIONS) -> str:
    r = opts.radius / (opts.extent * float(2**zoom))
    return f"""
WITH items AS (
  SELECT id, x, y, CAST(1 AS BIGINT) AS num_points,
         CAST(floor(x / {r!r}) AS BIGINT) AS cx,
         CAST(floor(y / {r!r}) AS BIGINT) AS cy
  FROM ({points_xy_sql})
),
pairs AS (
  SELECT a.id AS a_id, b.id AS b_id
  FROM items a
  JOIN items b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {r * r!r}
),
origin AS (
  SELECT a_id, MIN(b_id) AS origin_id FROM pairs GROUP BY a_id
),
valid AS (
  SELECT a_id AS valid_id FROM origin WHERE a_id = origin_id
),
assign AS (
  SELECT p.a_id, MIN(p.b_id) AS cluster_id
  FROM pairs p JOIN valid v ON p.b_id = v.valid_id
  GROUP BY p.a_id
),
members AS (
  SELECT i.id, i.x, i.y, i.num_points,
         COALESCE(a.cluster_id, i.id) AS cluster_id
  FROM items i LEFT JOIN assign a ON i.id = a.a_id
),
grouped AS (
  SELECT cluster_id, SUM(num_points) AS num_points,
         SUM(x * num_points) AS wx, SUM(y * num_points) AS wy,
         COUNT(*) AS n_members
  FROM members GROUP BY cluster_id
)
SELECT cluster_id AS id, num_points,
       round(wx / num_points, 7) AS cx_pos,
       round(wy / num_points, 7) AS cy_pos,
       (n_members > 1 AND num_points >= {opts.min_points}) AS is_cluster
FROM grouped
WHERE n_members > 1 AND num_points >= {opts.min_points}
UNION ALL
SELECT m.id, m.num_points,
       round(m.x, 7) AS cx_pos, round(m.y, 7) AS cy_pos,
       FALSE AS is_cluster
FROM members m
JOIN grouped g ON m.cluster_id = g.cluster_id
WHERE NOT (g.n_members > 1 AND g.num_points >= {opts.min_points})
"""
