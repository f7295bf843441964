"""Pre-rotation gate (VERDICT r10 "Next round" #1/#10): before a query
enters the 50-slot driver window, verify it against the DuckDB twin with
the STRICT harness *plus* the driver-canon probe (pandas sort_values over
raw cells — the exact step that crashed q_label_centroids /
q_inverted_index in CORRECTNESS_r10 while the repo replica stayed green).

Usage: python tools/rotation_check.py <sf_dir> <name> [<name> ...]
Prints PASS/FAIL per name; exit 0 iff all pass.

Dev-facing sweep script, collect-gate-exempt: it materializes results
driver-side to compare them; never part of a registered query plan.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from arrow_supercluster_spark.plans.registry import REGISTRY
from tests.oracle_harness import compare, duck_connection


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("rotation-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    rc = 0
    t0 = time.time()
    for name in names:
        qd = REGISTRY.get(name)
        if qd is None or qd.sql is None:
            print(f"FAIL {name}: not registered or rows-only", flush=True)
            rc = 1
            continue
        try:
            errs = compare(name, qd.spark(spark, sf_dir), con, qd.sql)
        except Exception as e:  # noqa: BLE001
            errs = [f"{name}: EXC {type(e).__name__}: {str(e)[:300]}"]
        if errs:
            rc = 1
            for e in errs:
                print(f"FAIL {e[:400]}", flush=True)
        else:
            print(f"PASS {name}", flush=True)
    print(f"done {len(names)} in {time.time()-t0:.0f}s rc={rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
