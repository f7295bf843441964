"""Round-8 scale sweep for the newest operator batches (VERDICT r7
"Next round" #8): run the batch-186..208 registry queries VERBATIM on a
16× fact-replicated copy of the sf0.1 tables, so their 100 TB posture
claims carry measured rows, not just design notes.

Scaling model — facts grow, dims don't (how a real corpus scales):
  events      16×  (event_id / user_id key-shifted per replica)
  documents   16×  (doc_id shifted; every 8th token salted per replica so
                    no 8-gram is shared ACROSS replicas — the
                    text_scale_sweep.py discipline)
  embeddings  16×  (vec_id shifted; one component perturbed per replica
                    so replicas are near but not exact duplicates)
  lineitem    16×  (l_orderkey shifted; part/supp FKs point at the 1× dims)
  orders      16×  (o_orderkey shifted; o_custkey points at the 1× dims)
  customer/supplier/part/nation/region — copied 1×.

Method: every query in plans/registry_ext{191..213} is timed once at 1×
(plain sf0.1), the TOP_N most expensive re-run against the 16× directory,
and the wall ratio reported.  A bucketed/banded/partial-agg plan should
scale ≲ linearly (ratio ≲ 16 with fixed job overhead amortizing); a
quadratic plan shows ratio → 256.

Run:  python tools/batch_scale_sweep.py          # JSON lines to stdout

Judge/dev-facing sweep script, collect-gate-exempt
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

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "24"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_SWEEP_REPLICAS", "16"))
TOP_N = int(os.environ.get("SPARK_GRAFT_SWEEP_TOP_N", "20"))
TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_SWEEP_TIMEOUT_S", "240"))
# Round-10 optimization round: the default window advances to the
# mid-build modules ext235..239 (HDR sketch/WL/blocklist, TPC-H
# decorrelation, LATERAL/betweenness/LDP, beam/CRDT/KV/quorum,
# partition-sizing/checkpoint/broadcast audits) — the batches the
# previous "228-235" half-open default never covered (swept this round,
# SCALING.md r10 rows).  ext228..234 carry early-r10 rows; ext214..227
# r9; ext191..213 r8.  Override with SPARK_GRAFT_SWEEP_MODULES="lo-hi"
# (hi EXCLUSIVE) to re-run an older window.
_MOD_RANGE = os.environ.get("SPARK_GRAFT_SWEEP_MODULES", "235-240")
_MOD_LO, _MOD_HI = (int(x) for x in _MOD_RANGE.split("-"))
BATCH_MODULES = [f"registry_ext{i}.py" for i in range(_MOD_LO, _MOD_HI)]

# Exact kernels that are EVAL-ONLY BY CONTRACT (module docstrings of
# registry_ext205/206: the q_silhouette class — production substitution
# is knn_edges_lsh / q_lof_ivf).  Scaling an eval-only O(n²) validator
# 16× measures nothing the contract claims; they are reported as skipped
# (no silent caps) rather than run.
EVAL_ONLY = {
    "q_dunn_index", "q_loocv_1nn", "q_hubness", "q_twonn_dim", "q_lid",
    # r9 additions — two more exact-kernel-by-contract families the 16×
    # leg flagged: (a) the exact-kNN-graph structure metrics (the graph
    # build is knn_edges_exact, the documented O(n²) eval kernel;
    # production graph constructor is knn_edges_lsh / q_knn_graph_lsh),
    # (b) the retrieval-eval family (MRR/NDCG/P-R@k score the EXACT
    # all-queries ranking by definition; production search is IVF/LSH —
    # the metrics exist to audit those paths at eval scale).
    "q_eigenvector_centrality", "q_reciprocity", "q_transitivity",
    "q_mrr", "q_mrr_bridge", "q_ndcg_at_k", "q_precision_recall_at_k",
}

_KEY_OFF = 1_000_000_000  # replica key shift: far above any base key


def _reps(spark, k):
    return spark.range(k).select(F.col("id").alias("rep"))


def scale_tables(spark, out_dir: str, k: int) -> None:
    """Write the fact tables at k× (key-shifted replicas) and the dims
    at 1× into out_dir — registry queries then run VERBATIM against it."""
    rd = lambda t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")  # noqa: E731
    wr = lambda df, t: df.write.mode("overwrite").parquet(  # noqa: E731
        f"{out_dir}/{t}.parquet"
    )

    for t in ("region", "nation", "customer", "supplier", "part"):
        wr(rd(t), t)

    ev = rd("events").crossJoin(_reps(spark, k))
    wr(
        ev.select(
            (F.col("event_id") + F.col("rep") * _KEY_OFF).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * _KEY_OFF).alias("user_id"),
            "event_type", "value", "props",
        ),
        "events",
    )

    toks = F.split(F.col("text"), " ")
    salted = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                (i % 8 == 0) & (F.col("rep") > 0),
                F.concat(x, F.lit("xr"), F.col("rep").cast("string")),
            ).otherwise(x),
        ),
        " ",
    )
    docs = rd("documents").crossJoin(_reps(spark, k))
    wr(
        docs.select(
            (F.col("doc_id") + F.col("rep") * _KEY_OFF).alias("doc_id"),
            salted.alias("text"),
            "lang", "source",
            F.length(salted).alias("n_chars"),
        ),
        "documents",
    )

    emb = rd("embeddings").crossJoin(_reps(spark, k))
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(
            i == 0, x + (F.col("rep") * 1e-3).cast("float")
        ).otherwise(x),
    )
    wr(
        emb.select(
            (F.col("vec_id") + F.col("rep") * _KEY_OFF).alias("vec_id"),
            perturbed.cast("array<float>").alias("embedding"),
            "label",
        ),
        "embeddings",
    )

    li = rd("lineitem").crossJoin(_reps(spark, k))
    wr(
        li.select(
            (F.col("l_orderkey") + F.col("rep") * _KEY_OFF).alias(
                "l_orderkey"
            ),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ),
        "lineitem",
    )

    orders = rd("orders").crossJoin(_reps(spark, k))
    wr(
        orders.select(
            (F.col("o_orderkey") + F.col("rep") * _KEY_OFF).alias(
                "o_orderkey"
            ),
            "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        ),
        "orders",
    )


def batch_queries():
    from arrow_supercluster_spark.plans.registry import REGISTRY

    out = []
    for name, qd in REGISTRY.items():
        mod = qd.spark.__code__.co_filename.rsplit("/", 1)[-1]
        if mod in BATCH_MODULES:
            out.append(name)
    return out


def timed_run(spark, name, sf_dir, timeout_s: int | None = None):
    """Wall-time one registry query; with timeout_s, a watchdog thread
    cancels the query's job group and the run reports "timeout" — a
    finding in itself (a 16× run that can't finish inside the budget is
    exactly what the sweep exists to surface), not a silent skip."""
    import threading

    from arrow_supercluster_spark.plans.registry import REGISTRY

    group = f"sweep-{name}"
    spark.sparkContext.setJobGroup(group, name, interruptOnCancel=True)
    cancel = None
    if timeout_s:
        cancel = threading.Timer(
            timeout_s, spark.sparkContext.cancelJobGroup, args=(group,)
        )
        cancel.daemon = True
        cancel.start()
    t0 = time.perf_counter()
    try:
        REGISTRY[name].spark(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 2)
    except Exception:
        if timeout_s and time.perf_counter() - t0 >= timeout_s - 1:
            return "timeout"
        raise
    finally:
        if cancel:
            cancel.cancel()
        spark.sparkContext.setJobGroup("", "")


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("batch-scale-sweep")
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
    try:
        if scratch_root and shutil.disk_usage("/dev/shm").free < (8 << 30):
            scratch_root = None
    except OSError:
        scratch_root = None
    scaled = tempfile.mkdtemp(prefix="sweep16_", dir=scratch_root)

    try:
        names = batch_queries()
        base = {}
        for n in names:
            base[n] = timed_run(spark, n, SF_DIR)
            print(
                json.dumps({"query": n, "replicas": 1, "sec": base[n]}),
                flush=True,
            )
        ranked = sorted(base, key=base.get, reverse=True)
        skipped = [n for n in ranked if n in EVAL_ONLY][:TOP_N]
        top = [n for n in ranked if n not in EVAL_ONLY][:TOP_N]
        for n in skipped:
            print(
                json.dumps(
                    {"query": n, "replicas": REPLICAS,
                     "skipped": "eval-only exact kernel by contract "
                                "(registry_ext205/206 docstrings); "
                                "production path is knn_edges_lsh/q_lof_ivf"}
                ),
                flush=True,
            )

        t0 = time.perf_counter()
        scale_tables(spark, scaled, REPLICAS)
        print(
            json.dumps(
                {"scale_tables_sec": round(time.perf_counter() - t0, 1),
                 "replicas": REPLICAS}
            ),
            flush=True,
        )

        for n in top:
            sec = timed_run(spark, n, scaled, timeout_s=TIMEOUT_S)
            row = {
                "query": n,
                "replicas": REPLICAS,
                "sec": sec,
                "sec_1x": base[n],
            }
            if isinstance(sec, (int, float)) and base[n]:
                row["ratio"] = round(sec / base[n], 1)
            print(json.dumps(row), flush=True)
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
