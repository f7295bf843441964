"""Solo idle-host medians of the driver-run-regressed bench queries
(VERDICT r9 "Next round" #2 — the r8-proven method: 7 samples, median,
on an otherwise-idle host, to separate code regressions from the
shared host's loadavg 2-5 neighbor steal).

Times EXACTLY what bench.py times, via the same code paths:
bench_load / bench_query / bench_pipeline rebuilt from the same
grid_cluster calls, and the registry queries via the same noop-write
form.  Prints one JSON line per target with all samples + median so
the record in PLANS.md is auditable.

Judge/dev-facing measurement script, collect-gate-exempt
(tests/test_collect_gate.py): it materializes timings driver-side to
print them; it is never part of a registered query plan.

Usage: python tools/solo_medians.py [runs=7]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))  # bench.py default


def timed_all(fn, warmup: int = 1, runs: int = 7):
    for _ in range(warmup):
        fn()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 3))
    med = sorted(samples)[len(samples) // 2]
    return med, samples


def main() -> int:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
    from arrow_supercluster_spark.operators import grid_cluster as gc
    from arrow_supercluster_spark.operators.filters import bbox_predicate
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.sources.points import derived_points

    # EXACTLY bench.py's build_spark config — numbers must be
    # like-for-like with the driver's bench run
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("solo-medians")
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

    scratch_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="solo_medians_", dir=scratch_root)
    world = (-180.0, -85.0, 180.0, 85.0)

    def load_hierarchy():
        shutil.rmtree(f"{workdir}/h", ignore_errors=True)
        gc.materialize_hierarchy(derived_points(spark, SF_DIR), f"{workdir}/h", OPTS)

    out = {}
    med, samples = timed_all(load_hierarchy, runs=runs)
    out["bench_load"] = med
    print(json.dumps({"q": "bench_load", "median": med, "samples": samples}), flush=True)

    nodes = spark.read.parquet(f"{workdir}/h")

    def query_all_zooms():
        for z in range(0, 17, 2):
            o = gc.finalize_clusters(nodes.filter(F.col("zoom") == z), OPTS)
            o.filter(bbox_predicate(*world)).write.mode("overwrite").format("noop").save()

    med, samples = timed_all(query_all_zooms, runs=runs)
    out["bench_query"] = med
    print(json.dumps({"q": "bench_query", "median": med, "samples": samples}), flush=True)

    def pipeline():
        pts = derived_points(spark, SF_DIR)
        z6 = gc.cluster_grid(pts, 6, OPTS)
        o = gc.finalize_clusters(z6, OPTS).filter(bbox_predicate(*world))
        o.write.mode("overwrite").format("noop").save()

    med, samples = timed_all(pipeline, runs=runs)
    out["bench_pipeline"] = med
    print(json.dumps({"q": "bench_pipeline", "median": med, "samples": samples}), flush=True)

    for name in ("q_window_rank", "q_get_clusters_z6"):
        qd = REGISTRY[name]

        def run(_qd=qd):
            _qd.spark(spark, SF_DIR).write.mode("overwrite").format("noop").save()

        med, samples = timed_all(run, runs=runs)
        out[name] = med
        print(json.dumps({"q": name, "median": med, "samples": samples}), flush=True)

    shutil.rmtree(workdir, ignore_errors=True)
    print("MEDIANS " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
