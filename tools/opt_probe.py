"""Optimization probe (round via $OPT_PROBE_ROUND, default r11): per-query isolated timing (noop sink,
guide §1.4) + `.explain("formatted")` capture for the plan-diff record
(plans/<round>/<query>_{before,after}.txt).

Usage:
  python tools/opt_probe.py explain <tag> <query> [query ...]
      → writes plans/<round>/<query>_<tag>.txt for each name
  python tools/opt_probe.py time <query> [query ...] [--runs N]
      → prints median-of-N (warmup 1) per query, bench.py methodology
  python tools/opt_probe.py setsim
      → stage-level breakdown of q_setsim_join's invocation

Judge/dev-facing measurement script, collect-gate-exempt
(tests/test_collect_gate.py): it materializes timings/plans driver-side
to print them; it is never part of a registered query plan.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("OPT_PROBE_ROUND", "r11"))


def build_spark() -> SparkSession:
    # Mirror bench.py's session so plans/timings match what the driver sees.
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("opt-probe")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def capture_explain(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def timed(fn, warmup: int = 1, runs: int = 5) -> float:
    for _ in range(warmup):
        fn()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    mode = sys.argv[1]
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from arrow_supercluster_spark.plans.registry import REGISTRY

    if mode == "explain":
        tag = sys.argv[2]
        names = sys.argv[3:]
        os.makedirs(PLANS_DIR, exist_ok=True)
        for name in names:
            spark.sparkContext.setJobDescription(f"explain {name}")
            df = REGISTRY[name].spark(spark, SF_DIR)
            text = capture_explain(df)
            path = os.path.join(PLANS_DIR, f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(text)
            n_ex = text.count("Exchange")
            joins = [
                j for j in (
                    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct",
                ) if j in text
            ]
            pyn = [
                p for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                            "MapInPandas", "FlatMapGroupsInPandas") if p in text
            ]
            print(f"{name}: {n_ex} Exchange, joins={joins}, python={pyn} -> {path}")
        return 0

    if mode == "time":
        args = [a for a in sys.argv[2:] if not a.startswith("--")]
        runs = 5
        for a in sys.argv[2:]:
            if a.startswith("--runs"):
                runs = int(a.split("=")[1])
        for name in args:
            qd = REGISTRY[name]
            spark.sparkContext.setJobDescription(f"time {name}")
            med = timed(lambda: noop(qd.spark(spark, SF_DIR)), runs=runs)
            print(f"{name}: {med:.3f}s (median of {runs})")
        return 0

    if mode == "setsim":
        # Stage-level breakdown of one q_setsim_join invocation.
        from pyspark.sql import functions as F

        from arrow_supercluster_spark.operators.dedup import tokenize
        from arrow_supercluster_spark.plans.registry_ext import _docs
        from arrow_supercluster_spark.plans import registry_ext89 as m

        def stamp(label, t0):
            t1 = time.perf_counter()
            print(f"  {label}: {t1 - t0:.3f}s", flush=True)
            return t1

        for it in range(3):
            print(f"invocation {it}:")
            t0 = time.perf_counter()
            docs = _docs(spark, SF_DIR)
            sets0 = docs.select(
                "doc_id", F.array_distinct(tokenize(F.col("text"))).alias("toks")
            ).select("doc_id", "toks", F.size("toks").alias("sz")).filter(
                F.col("sz") > 0
            )
            toks_flat = sets0.select(F.explode("toks").alias("tok"))
            sample = (
                toks_flat.limit(200_000).distinct().limit(63).collect()
            )
            t0 = stamp("sample probe", t0)
            probe = toks_flat.distinct().limit(63).collect()
            t0 = stamp("full vocab probe", t0)
            vocab = sorted(r.tok for r in probe)
            fast = m._setsim_bitmask(spark, sets0, vocab)
            t0 = stamp("bitmask build (ckpt+mask-count probes)", t0)
            noop(fast)
            t0 = stamp("noop write of result", t0)
        return 0

    if mode == "census":
        out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/census.jsonl"
        time_all(spark, REGISTRY, SF_DIR, out_path)
        return 0

    print(f"unknown mode {mode}", file=sys.stderr)
    return 2


def time_all(spark, registry, sf_dir, out_path):
    """One timed noop per registry query at sf_dir — the round-10
    full-surface wall-clock census (append-mode JSON lines)."""
    import json

    done = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["query"])
                except Exception:
                    pass
    with open(out_path, "a") as fh:
        for name, qd in registry.items():
            if name in done:
                continue
            spark.sparkContext.setJobDescription(f"census {name}")
            t0 = time.perf_counter()
            try:
                noop(qd.spark(spark, sf_dir))
                rec = {"query": name, "sec": round(time.perf_counter() - t0, 2)}
            except Exception as e:  # noqa: BLE001
                rec = {"query": name, "err": f"{type(e).__name__}: {e}"[:200],
                       "sec": round(time.perf_counter() - t0, 2)}
            fh.write(json.dumps(rec) + "\n")
            fh.flush()


if __name__ == "__main__":
    sys.exit(main())
