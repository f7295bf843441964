"""Round-6 registry additions, batch 160 — streaming sketch
maintenance and exactly-once discipline:

- q_hll_stream: HyperLogLog distinct-user maintenance over the event
  STREAM — each micro-batch (availableNow file stream, foreachBatch)
  writes a fixed 64-register partial; the merged view is a register
  MAX, which is HLL's lossless merge operator, so the streamed
  estimate is bit-identical to the batch build no matter how the
  stream was chunked. The streaming counterpart of q_hll_portable.
- q_hist_quantiles: mergeable equi-width histogram quantiles —
  fixed-bin counts (the partial-aggregable sketch every engine's
  approx_percentile builds on), interpolated p50/p90/p99 vs the exact
  percentiles, with the bin-width error bound shipped and checked.
  Unlike q_approx_quantiles (engine-native GK), this sketch is
  hand-rolled so the SQL twin reproduces it exactly.
- q_replay_idempotence: the at-least-once replay discipline measured —
  per-batch partial counts written under batch_id=N paths, one batch
  REPLAYED (overwriting its own path), merged totals asserted
  unchanged. The foreachBatch idempotence contract
  (streaming/sketches.py's documented design) as a checkable query.

At 100 TB: HLL partials are 64 rows/batch regardless of batch size;
the histogram is one groupBy over literal bins; replay writes are
per-batch-bounded.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_HS_M = 64  # HLL registers
_HS_P = 2147483647
_HQ_BINS = 40
_HQ_LO, _HQ_HI = 0.0, 500.0  # purchase-value histogram domain


def hll_user_registers(df):
    """(bucket, rho) HLL partials for distinct user_id: portable
    integer hash, bucket = h mod m, rho = leading-zero rank of the
    remaining 25 bits (+1) — the q_hll_portable formulation on an
    integer key. The Knuth multiplier wraps the modulus even for
    small ids (48271 alone does NOT mix ids < 45k — caught by the
    first smoke run, estimate 573x off). MAX over rho per bucket is
    the merge."""
    hv = (F.col("user_id") * 2654435761 + 12345) % _HS_P
    return df.select(
        F.pmod(hv, F.lit(_HS_M)).alias("bucket"),
        F.when(F.floor(hv / _HS_M) == 0, F.lit(26))
        .otherwise(
            F.lit(25) - F.floor(F.log2(F.floor(hv / _HS_M))).cast("int")
        )
        .alias("rho"),
    ).groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers):
    """αm²/Σ2^(−M_j) with linear counting below 2.5m (the standard
    small-range correction); missing buckets count as register 0."""
    import math

    m = _HS_M
    alpha = 0.709  # alpha_64
    full = registers.groupBy().agg(
        F.sum(F.pow(2.0, -F.col("rho"))).alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    return full.select(
        (
            F.lit(alpha * m * m)
            / (F.col("s") + (m - F.col("nz")) * 1.0)
        ).alias("raw"),
        F.col("nz"),
    ).select(
        F.when(
            (F.col("raw") < 2.5 * m) & (F.col("nz") < m),
            F.lit(float(m))
            * F.log(F.lit(float(m)) / (m - F.col("nz"))),
        )
        .otherwise(F.col("raw"))
        .alias("estimate")
    )


# ===========================================================================
# R473 — streaming HLL maintenance
# ===========================================================================

@register("q_hll_stream", None)
def q_hll_stream(spark, sf_dir):
    """R473 — HLL over the event stream: availableNow file stream over
    the EXISTING events parquet bytes (r6 ADVICE: the previous
    write-then-re-stream source duplicated the full corpus into /tmp
    and never removed it — at 100 TB the copy IS the dominant cost).
    FileStreamSource needs a directory, and the testdata table is a
    single file, so the source dir holds one O(1) SYMLINK to it — zero
    bytes copied (on a cluster the table is already a directory and
    streams directly). foreachBatch writes each micro-batch's
    64-register partial under
    batch_id=N (idempotent under replay — a batch overwrites only its
    own path), merged registers = MAX per bucket, estimate with the
    small-range linear-counting correction. Because MAX-merge is
    exactly the batch build's aggregation tree, the streamed registers
    equal the batch registers bit-for-bit (asserted in tests, with the
    exact distinct and relative error in the output). The ≤64 merged
    registers are materialized before the try/finally removes the
    sink, so no scratch outlives the call."""
    import os
    import shutil

    ev = read_events(spark, sf_dir)
    # stream the raw files with their on-disk schema; the fold only
    # touches user_id, so timestamp normalization is irrelevant here
    src = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(src).schema
    srcdir = tempfile.mkdtemp(prefix="hll_stream_src_")
    sink = tempfile.mkdtemp(prefix="hll_stream_sink_")
    try:
        if os.path.isdir(src):
            # table is already a directory of files: stream it directly
            stream_path = src
        else:
            # single-file table: one symlink, zero bytes copied
            os.symlink(src, f"{srcdir}/events.parquet")
            stream_path = srcdir
        stream = spark.readStream.schema(raw_schema).parquet(stream_path)

        def fold(batch_df, batch_id: int) -> None:
            hll_user_registers(batch_df).write.mode("overwrite").parquet(
                f"{sink}/batch_id={batch_id}"
            )

        q = (
            stream.writeStream.foreachBatch(fold)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        merged_df = (
            spark.read.parquet(f"{sink}/batch_id=*")
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
        )
        # bounded collect: at most _HS_M = 64 register rows
        regs = merged_df.collect()
        schema = merged_df.schema
    finally:
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(srcdir, ignore_errors=True)
    merged = spark.createDataFrame(regs, schema)
    est = hll_estimate(merged)
    exact = ev.agg(F.countDistinct("user_id").alias("exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("exact").cast("long").alias("exact_distinct"),
        F.round("estimate", 4).alias("hll_estimate"),
        F.round(
            F.abs(F.col("estimate") - F.col("exact")) / F.col("exact"), 4
        ).alias("rel_error"),
    )


# ===========================================================================
# R474 — mergeable histogram quantiles
# ===========================================================================

@register(
    "q_hist_quantiles",
    f"""
    WITH vals AS (
      SELECT CAST(round(value * 100) AS BIGINT) / 100.0 AS x
      FROM events WHERE event_type = 'purchase'
    ),
    hist AS (
      SELECT least(CAST(floor((x - {_HQ_LO}) / (({_HQ_HI} - {_HQ_LO})
                               / {_HQ_BINS})) AS INTEGER),
                   {_HQ_BINS} - 1) AS b,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM vals GROUP BY 1
    ),
    cum AS (
      SELECT b, n,
             SUM(n) OVER (ORDER BY b) AS cn,
             (SELECT SUM(n) FROM hist) AS tot
      FROM hist
    ),
    qs AS (
      SELECT q,
             (SELECT MIN(b) FROM cum WHERE cn >= q * tot) AS qb
      FROM (SELECT UNNEST([0.5, 0.9, 0.99]) AS q)
    ),
    ordv AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS n FROM vals GROUP BY x
    ),
    cumv AS (
      SELECT x, SUM(n) OVER (ORDER BY x) AS cn,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM vals) AS tot
      FROM ordv
    ),
    exact AS (
      SELECT qs.q,
             (SELECT MIN(x) FROM cumv
              WHERE cn >= CAST(qs.q AS DOUBLE) * tot) AS ex
      FROM qs
    ),
    est AS (
      SELECT qs.q,
             {_HQ_LO} + (qs.qb + 0.5) * (({_HQ_HI} - {_HQ_LO})
                                         / {_HQ_BINS}) AS approx,
             exact.ex AS ex
      FROM qs JOIN exact ON qs.q = exact.q
    )
    SELECT est.q,
           round(est.approx, 4) AS hist_quantile,
           round(est.ex, 4) AS exact_quantile,
           round(abs(est.approx - est.ex), 4) AS abs_error,
           abs(est.approx - est.ex)
             <= ({_HQ_HI} - {_HQ_LO}) * 0.5 / {_HQ_BINS} + 1e-9
             AS within_bin_bound
    FROM est ORDER BY est.q
    """,
)
def q_hist_quantiles(spark, sf_dir):
    """R474 — equi-width-histogram quantiles over purchase values:
    {b} fixed bins on [{lo}, {hi}] (counts partial-aggregate map-side
    and MERGE BY SUM — the sketch property that makes this the
    distributed quantile workhorse), estimate = midpoint of the first
    bin whose cumulative count crosses q·N, vs the exact TYPE-1
    (inverse-CDF) percentile — the crossing bin provably CONTAINS the
    type-1 quantile, so the half-bin-width bound shipped as
    within_bin_bound is a theorem, not an empirical accident (r6
    ADVICE: the interpolated quantile_cont percentile can straddle
    into a sparse tail and legitimately exceed one bin width). The
    value-collapsed cumulative window is bounded by the ≤ {mx}
    distinct cent values of the [{lo}, {hi}] domain. The hand-rolled
    twin of q_approx_quantiles' engine-native sketch.""".format(
        b=_HQ_BINS, lo=_HQ_LO, hi=_HQ_HI,
        mx=int((_HQ_HI - _HQ_LO) * 100) + 1,
    )
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    vals = ev.select(
        (F.round(F.col("value") * 100).cast("long") / 100.0)
        .cast("double").alias("x")
    )
    width = (_HQ_HI - _HQ_LO) / _HQ_BINS
    hist = vals.groupBy(
        F.least(
            F.floor((F.col("x") - _HQ_LO) / width).cast("int"),
            F.lit(_HQ_BINS - 1),
        ).alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = hist.agg(F.sum("n").alias("tot"))
    cum = hist.select(
        "b", "n", F.sum("n").over(Window.orderBy("b")).alias("cn")
    ).crossJoin(F.broadcast(tot))
    qs = spark.createDataFrame(
        [(0.5,), (0.9,), (0.99,)], "q double"
    )
    qb = (
        qs.join(cum, cum.cn >= qs.q * cum.tot)
        .groupBy("q")
        .agg(F.min("b").alias("qb"))
    )
    # exact TYPE-1 (inverse-CDF) quantile: min x whose value-collapsed
    # cumulative count reaches q*N.  The window is value-collapsed —
    # bounded by the <= 50,001 distinct cent values of the domain, the
    # q_cvm_test de-weak pattern — and the q*N comparison is the same
    # IEEE double product in both engines (SQL casts q to DOUBLE).
    valcnt = vals.groupBy("x").agg(F.count(F.lit(1)).alias("n"))
    cumv = valcnt.select(
        "x", F.sum("n").over(Window.orderBy("x")).alias("cn")
    ).crossJoin(F.broadcast(tot))
    exq = (
        qs.join(cumv, cumv.cn >= qs.q * cumv.tot)
        .groupBy("q")
        .agg(F.min("x").alias("ex"))
    )
    est = qb.join(exq, "q").select(
        "q",
        (F.lit(_HQ_LO) + (F.col("qb") + 0.5) * width).alias("approx"),
        F.col("ex").alias("exact"),
    )
    return est.select(
        "q",
        F.round("approx", 4).alias("hist_quantile"),
        F.round("exact", 4).alias("exact_quantile"),
        F.round(F.abs(F.col("approx") - F.col("exact")), 4).alias(
            "abs_error"
        ),
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= width * 0.5 + 1e-9
        ).alias("within_bin_bound"),
    ).orderBy("q")


# ===========================================================================
# R475 — at-least-once replay idempotence
# ===========================================================================

@register("q_replay_idempotence", None)
def q_replay_idempotence(spark, sf_dir):
    """R475 — the foreachBatch idempotence contract, measured: per-day
    partial (count, revenue-cents) aggregates are written under
    batch_id=N paths (3 deterministic day-range batches), then batch 1
    is REPLAYED (overwriting its own path, as an at-least-once restart
    would). The merged rollup before and after the replay must be
    IDENTICAL — that equality is the output's `replay_consistent`
    column, alongside the totals, so the driver check fails if the
    overwrite-own-path discipline ever regresses to append."""
    ev = read_events(spark, sf_dir)
    sink = tempfile.mkdtemp(prefix="replay_idem_")
    d = F.dayofmonth("ts")
    batches = [(1, 10), (11, 20), (21, 31)]

    def write_batch(i, lo, hi):
        (
            ev.filter((d >= lo) & (d <= hi))
            .groupBy(d.alias("day"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                ).alias("cents"),
            )
            .write.mode("overwrite")
            .parquet(f"{sink}/batch_id={i}")
        )

    for i, (lo, hi) in enumerate(batches):
        write_batch(i, lo, hi)

    def rollup():
        return (
            spark.read.parquet(f"{sink}/batch_id=*")
            .agg(
                F.sum("n").alias("n"),
                F.sum("cents").alias("cents"),
                F.count(F.lit(1)).alias("day_rows"),
            )
        )

    before = rollup().collect()[0]
    write_batch(1, *batches[1])  # the replay
    after = rollup().collect()[0]
    consistent = (
        before.n == after.n
        and before.cents == after.cents
        and before.day_rows == after.day_rows
    )
    return spark.createDataFrame(
        [
            (
                int(after.n),
                int(after.cents),
                int(after.day_rows),
                bool(consistent),
            )
        ],
        "n_events long, revenue_cents long, day_rows long, "
        "replay_consistent boolean",
    )
