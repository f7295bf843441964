"""q_cluster_radius_hier probe (VERDICT r10 "Next round" #5): the 17-level
radius hierarchy is the top remaining census wall (~36 s at sf0.1).  Each
level currently runs TWO 9-cell neighbor joins (full pair derivation for
origin, valid-restricted re-join for assignment).  This probe times the
full hierarchy for candidate level formulations inside one session,
alternated, and asserts the outputs identical to the current form.

Variants:
  v0  — current radius_cluster_level
  v1  — single pair derivation reused for origin AND assignment
        (assign = pairs semi-joined to valid origins on b_id); relies on
        exchange reuse instead of a second explode+join
  v2  — v1 with the pair table eagerly checkpointed per level

Usage: python tools/radius_ab.py [v0 v1 ...] [--rounds N]

Judge/dev-facing measurement script, collect-gate-exempt
(tests/test_collect_gate.py): it materializes timings driver-side to
print them; it is never part of a registered query plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def level_v1(items: DataFrame, zoom: int, opts, checkpoint_pairs: bool = False) -> DataFrame:
    from arrow_supercluster_spark.operators.radius_cluster import _neighbor_pairs

    r = opts.radius / (opts.extent * float(2**zoom))
    pairs = _neighbor_pairs(items, r).select("a_id", "b_id")
    if checkpoint_pairs:
        pairs = pairs.localCheckpoint(eager=True)
    origin = pairs.groupBy("a_id").agg(F.min("b_id").alias("origin_id"))
    valid = origin.filter(F.col("a_id") == F.col("origin_id")).select(
        F.col("a_id").alias("valid_id")
    )
    assign = (
        pairs.join(valid, pairs.b_id == valid.valid_id, "leftsemi")
        .groupBy("a_id")
        .agg(F.min("b_id").alias("cluster_id"))
    )
    members = (
        items.join(assign, items.id == assign.a_id, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "id"))
    )
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


def hierarchy_with(level_fn, points_xy, opts) -> DataFrame:
    items = points_xy.select(
        "id", "x", "y", F.lit(1).cast("long").alias("num_points")
    ).localCheckpoint()
    levels = [
        items.select(
            F.lit(opts.leaf_zoom).alias("zoom"), "id", "x", "y", "num_points",
            (F.col("num_points") > 1).alias("is_cluster"),
        )
    ]
    cur = items
    for z in range(opts.max_zoom, opts.min_zoom - 1, -1):
        out = level_fn(cur, z, opts).localCheckpoint()
        levels.append(
            out.select(F.lit(z).alias("zoom"), "id", "x", "y", "num_points", "is_cluster")
        )
        cur = out.select("id", "x", "y", "num_points")
    result = levels[0]
    for lv in levels[1:]:
        result = result.unionByName(lv)
    return result


def main() -> int:
    argv = sys.argv[1:]
    rounds = 3
    if "--rounds" in argv:
        i = argv.index("--rounds")
        rounds = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    variants = argv or ["v0", "v1"]
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("radius-ab")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
    from arrow_supercluster_spark.operators import radius_cluster as rc
    from arrow_supercluster_spark.operators.grid_cluster import prepare_points
    from arrow_supercluster_spark.sources.points import derived_points

    pts = prepare_points(derived_points(spark, SF_DIR))

    FNS = {
        "v0": rc.radius_cluster_level,
        "v1": lambda i, z, o: level_v1(i, z, o, checkpoint_pairs=False),
        "v2": lambda i, z, o: level_v1(i, z, o, checkpoint_pairs=True),
    }

    # equivalence first: v-variant output must equal v0's exactly
    base = hierarchy_with(FNS["v0"], pts, OPTS)
    for v in variants:
        if v == "v0":
            continue
        alt = hierarchy_with(FNS[v], pts, OPTS)
        d1 = base.exceptAll(alt).count()
        d2 = alt.exceptAll(base).count()
        print(json.dumps({"variant": v, "exceptAll": [d1, d2]}), flush=True)
        assert d1 == 0 and d2 == 0, f"{v} output differs"

    acc = {v: [] for v in variants}
    for rnd in range(rounds):
        for v in variants:
            spark.sparkContext.setJobDescription(f"radius_ab {v} round {rnd}")
            t0 = time.perf_counter()
            hierarchy_with(FNS[v], pts, OPTS).write.mode("overwrite").format("noop").save()
            acc[v].append(round(time.perf_counter() - t0, 3))
    med = lambda xs: sorted(xs)[len(xs) // 2]
    for v in variants:
        print(json.dumps({"variant": v, "median_sec": med(acc[v]), "samples": acc[v]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
