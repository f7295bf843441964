"""Cold-JVM A/B for minhash_docs (VERDICT r10 "Next round" #3): the r10
per-row HOF fold vs the r9 explode+16-min-agg, measured through the full
q_dedup_minhash bench section (lsh_candidate_pairs) with bench.py's
session config and timing methodology, one FRESH process per invocation.

Usage: python tools/minhash_ab.py fold|explode [--runs N]
Prints one JSON line {"variant":..., "median_sec":..., "samples":[...]}.

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


def minhash_explode(
    docs: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """The r9 form: digest shingles inside the array, explode digests,
    num_hashes min-aggregations grouped by doc (map-side partials;
    shuffle carries (key, 16 longs)).  Bit-identical signatures to the
    fold form (verified r10)."""
    from arrow_supercluster_spark.operators.dedup import shingles, spread, tokenize

    sh = spread(docs).select(
        F.col(key),
        F.explode(
            F.transform(
                shingles(tokenize(F.col(text)), shingle_k),
                lambda s: F.xxhash64(s),
            )
        ).alias("sh"),
    )
    sig = sh.groupBy(key).agg(
        *[
            F.min(F.xxhash64("sh", F.lit(j))).alias(f"h{j}")
            for j in range(num_hashes)
        ]
    )
    return sig.select(
        F.col(key),
        F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("signature"),
    )


def main() -> int:
    variant = sys.argv[1]
    runs = 5
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    from arrow_supercluster_spark.operators import dedup

    if variant == "explode":
        dedup.minhash_docs = minhash_explode
    elif variant != "fold":
        raise SystemExit(f"unknown variant {variant}")

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"minhash-ab-{variant}")
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
    from arrow_supercluster_spark.plans.registry import REGISTRY

    qd = REGISTRY["q_dedup_minhash"]

    def run():
        qd.spark(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    run()  # warmup
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        samples.append(round(time.perf_counter() - t0, 3))

    def rss_mib():
        total = 0
        me = str(os.getpid())
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    parts = fh.read().split()
                if pid == me or parts[3] == me:
                    with open(f"/proc/{pid}/status") as fh:
                        for line in fh:
                            if line.startswith("VmRSS:"):
                                total += int(line.split()[1])
            except OSError:
                continue
        return round(total / 1024.0, 1)

    out = {
        "variant": variant,
        "median_sec": sorted(samples)[len(samples) // 2],
        "samples": samples,
        "end_rss_mib": rss_mib(),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
