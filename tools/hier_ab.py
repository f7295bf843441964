"""Hierarchy write-layout A/B (VERDICT r10 "Next round" #4): the r10
REBALANCE(zoom) hint collapsed the sf0.1 hierarchy to one file per zoom
(single-task pruned reads) and added an extra exchange + AQE stage to
both materialize writes (mask selectivity monotonicity inverted).  This
probe times bench.py's load / query / mask sections for each candidate
layout INSIDE one session (alternated), and reports files-per-zoom.

Variants:
  rebalance   — r10 current: .hint("rebalance", "zoom") on both writes
  plain       — r9: no hint (writes inherit the aggregation partitioning)
  upper_only  — hint only on the upper-levels write
  bucket<N>   — .hint("rebalance", "zoom", pmod(xxhash64(cell), N))

Usage: python tools/hier_ab.py [variant ...]   (default: all, alternated)

Judge/dev-facing measurement script, collect-gate-exempt
(tests/test_collect_gate.py): it materializes timings driver-side to
print them; it is never part of a registered query plan.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def materialize_variant(leaf, path, opts, variant: str):
    """Copy of grid_cluster.materialize_from_leaf with the write layout
    parameterized (kept in lockstep with the operator)."""
    from arrow_supercluster_spark.operators.grid_cluster import NODE_COLS

    spark = leaf.sparkSession

    def writer(df, mode):
        if variant == "rebalance" or (
            variant == "upper_only" and mode == "append"
        ):
            df = df.hint("rebalance", "zoom")
        elif variant.startswith("upper_bucket") and mode == "append":
            n = int(variant[len("upper_bucket"):])
            df = (
                df.withColumn(
                    "_wb", F.pmod(F.xxhash64("cell_x", "cell_y"), F.lit(n))
                )
                .hint("rebalance", "zoom", "_wb")
                .drop("_wb")
            )
        elif variant.startswith("upper_bucket"):
            pass  # leaf write: inherit the aggregation partitioning
        elif variant.startswith("bucket"):
            n = int(variant[len("bucket"):])
            df = (
                df.withColumn(
                    "_wb", F.pmod(F.xxhash64("cell_x", "cell_y"), F.lit(n))
                )
                .hint("rebalance", "zoom", "_wb")
                .drop("_wb")
            )
        df.write.mode(mode).partitionBy("zoom").parquet(path)

    writer(leaf, "overwrite")
    leaf_df = spark.read.schema(leaf.schema).parquet(path)
    zooms = spark.range(opts.min_zoom, opts.max_zoom + 1).select(
        F.col("id").cast("int").alias("zoom")
    )
    shift = F.pow(F.lit(2.0), F.lit(opts.leaf_zoom) - F.col("zoom"))
    upper = (
        leaf_df.drop("zoom")
        .crossJoin(F.broadcast(zooms))
        .groupBy(
            "zoom",
            F.floor(F.col("cell_x") / shift).alias("cell_x"),
            F.floor(F.col("cell_y") / shift).alias("cell_y"),
        )
        .agg(
            F.sum("num_points").alias("num_points"),
            F.sum("sum_x").alias("sum_x"),
            F.sum("sum_y").alias("sum_y"),
            F.min("min_id").alias("min_id"),
            F.min("min_lng").alias("min_lng"),
            F.min("min_lat").alias("min_lat"),
        )
        .select(*NODE_COLS)
    )
    writer(upper, "append")
    return spark.read.schema(leaf.schema).parquet(path)


def main() -> int:
    variants = sys.argv[1:] or ["rebalance", "plain", "upper_only", "bucket8"]
    rounds = 3
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("hier-ab")
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
    from arrow_supercluster_spark.operators import grid_cluster as gc
    from arrow_supercluster_spark.operators.filters import bbox_predicate
    from arrow_supercluster_spark.sources.points import derived_points

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="hier_ab_", dir=scratch)
    world = (-180.0, -85.0, 180.0, 85.0)

    def prep(pts, prepared=False):
        p = pts if prepared else gc.prepare_points(pts)
        return gc.cell_agg(gc.with_cells(p, OPTS.leaf_zoom, OPTS), OPTS.leaf_zoom)

    acc: dict[str, dict[str, list[float]]] = {
        v: {"load": [], "query": [], "mask10": []} for v in variants
    }
    files_per_zoom: dict[str, str] = {}

    for rnd in range(rounds):
        for v in variants:
            spark.sparkContext.setJobDescription(f"hier_ab {v} round {rnd}")
            path = f"{workdir}/{v}"
            # load (cold write)
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.perf_counter()
            materialize_variant(prep(derived_points(spark, SF_DIR)), path, OPTS, v)
            acc[v]["load"].append(round(time.perf_counter() - t0, 3))
            if v not in files_per_zoom:
                zcounts = {}
                for d in sorted(os.listdir(path)):
                    if d.startswith("zoom="):
                        zcounts[int(d.split("=")[1])] = len(
                            [f for f in os.listdir(f"{path}/{d}") if f.endswith(".parquet")]
                        )
                files_per_zoom[v] = (
                    f"total={sum(zcounts.values())} "
                    + ",".join(f"{z}:{c}" for z, c in sorted(zcounts.items()))
                )
            # query (reads)
            nodes = spark.read.parquet(path)
            t0 = time.perf_counter()
            for z in range(0, 17, 2):
                out = gc.finalize_clusters(nodes.filter(F.col("zoom") == z), OPTS)
                out.filter(bbox_predicate(*world)).write.mode("overwrite").format("noop").save()
            acc[v]["query"].append(round(time.perf_counter() - t0, 3))
            # mask10 (selective write)
            mpath = f"{workdir}/{v}_m"
            shutil.rmtree(mpath, ignore_errors=True)
            pts = derived_points(spark, SF_DIR).filter(F.col("id") % 10 == 0)
            t0 = time.perf_counter()
            materialize_variant(prep(pts), mpath, OPTS, v)
            acc[v]["mask10"].append(round(time.perf_counter() - t0, 3))

    med = lambda xs: sorted(xs)[len(xs) // 2]
    for v in variants:
        print(json.dumps({
            "variant": v,
            "load_med": med(acc[v]["load"]), "load": acc[v]["load"],
            "query_med": med(acc[v]["query"]), "query": acc[v]["query"],
            "mask10_med": med(acc[v]["mask10"]), "mask10": acc[v]["mask10"],
            "files": files_per_zoom.get(v, "?"),
        }))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
