"""Round-7 registry additions, batch 193 — stream-stream join + series
homogeneity tests:

- q_stream_stream_join: a REAL Structured Streaming stream-stream
  inner join (StreamingSymmetricHashJoin) — purchases × clicks per
  user within ±10 minutes, both sides watermarked 60 min, availableNow
  over the existing events parquet (symlink source dir, zero bytes
  copied — the q_hll_stream discipline), pairs land in a parquet sink
  and fold to per-user counts.  The time-range condition bounds the
  join state; the single-file source makes the result exactly the
  batch interval join, which is the SQL twin.
- q_pettitt_test: the Pettitt (1979) rank-based changepoint test on
  daily purchase counts — U_t = ΣΣ sign(x_i − x_j) over pairs
  straddling each boundary, K = max|U_t| (earliest argmax), the
  published approximation p ≈ 2·exp(−6K²/(n³+n²)).  No windows: the
  boundary×pair stage is a three-way join on the ≤61-row day frame.
- q_von_neumann: the von Neumann successive-difference ratio
  η = Σ(x_{t+1}−x_t)²/Σ(x_t−x̄)² with the normal approximation
  z = (η−2)/sqrt(4(n−2)/(n²−1)) — the classic randomness-vs-trend
  screen; adjacency via a rank self-join on the day frame.

At 100 TB: the streaming join's state is bounded by the watermark ×
rate product and the sink carries only matched pairs; the two tests
collapse the corpus once to daily counts.  Counts are exact integers;
outputs round to 6.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_SSJ_INTERVAL_MIN = 10
_SSJ_WATERMARK = "60 minutes"
_PT_SIG = 0.05


# ===========================================================================
# R575 — stream-stream interval join (purchases x clicks, ±10 min)
# ===========================================================================

@register(
    "q_stream_stream_join",
    f"""
    WITH p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM p JOIN c ON c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL {_SSJ_INTERVAL_MIN} MINUTE
                  AND p.ts + INTERVAL {_SSJ_INTERVAL_MIN} MINUTE
    GROUP BY 1 ORDER BY 1
    """,
)
def q_stream_stream_join(spark, sf_dir):
    """R575 — StreamingSymmetricHashJoin: both sides watermarked, the
    ±10-min range condition bounds state eviction.  availableNow over
    the single-file source processes everything in one micro-batch,
    so the streamed pair set IS the batch interval join (the twin);
    streaming≡batch asserted in tests.  The per-user fold result is
    materialized (it is the query's result set) before the sink and
    checkpoint dirs are removed."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    src = f"{sf_dir}/events.parquet"
    raw_schema = spark.read.parquet(src).schema
    srcdir = tempfile.mkdtemp(prefix="ssj_src_")
    sink = tempfile.mkdtemp(prefix="ssj_sink_")
    ckpt = tempfile.mkdtemp(prefix="ssj_ckpt_")
    try:
        if os.path.isdir(src):
            stream_path = src
        else:
            os.symlink(src, f"{srcdir}/events.parquet")
            stream_path = srcdir
        stream = spark.readStream.schema(raw_schema).parquet(stream_path)
        ts_type = dict(stream.dtypes).get("ts")
        if ts_type == "bigint":
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        p = (
            stream.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", _SSJ_WATERMARK)
        )
        c = (
            stream.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", _SSJ_WATERMARK)
        )
        pairs = p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (
                F.col("c_ts")
                >= F.col("p_ts")
                - F.expr(f"INTERVAL {_SSJ_INTERVAL_MIN} MINUTES")
            )
            & (
                F.col("c_ts")
                <= F.col("p_ts")
                + F.expr(f"INTERVAL {_SSJ_INTERVAL_MIN} MINUTES")
            ),
        )
        q = (
            pairs.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(sink)
            .groupBy(F.col("p_user").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("user_id")
        )
        # materialize the |users|-sized result (the query's own output)
        # so the scratch dirs can be removed immediately
        return truncate(out)
    finally:
        shutil.rmtree(sink, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(srcdir, ignore_errors=True)


# ===========================================================================
# R576 — Pettitt changepoint test on daily purchase counts
# ===========================================================================

_SQL_PT_DAILY = """
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
"""


@register(
    "q_pettitt_test",
    f"""
    WITH daily AS ({_SQL_PT_DAILY}),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
    u AS (
      SELECT b.d AS bound,
             CAST(SUM(CASE WHEN i.x > j.x THEN 1
                           WHEN i.x < j.x THEN -1 ELSE 0 END)
                  AS BIGINT) AS u_t
      FROM daily b
      JOIN daily i ON i.d <= b.d
      JOIN daily j ON j.d > b.d
      GROUP BY 1
    ),
    k AS (SELECT MAX(abs(u_t)) AS k_stat FROM u),
    cp AS (
      SELECT MIN(bound) AS change_day
      FROM u CROSS JOIN k WHERE abs(u_t) = k_stat
    )
    SELECT n_days, strftime(change_day, '%Y-%m-%d') AS change_day,
           k_stat,
           round(2.0 * exp(-6.0 * k_stat * k_stat
                 / (CAST(n_days AS DOUBLE) * n_days * n_days
                    + CAST(n_days AS DOUBLE) * n_days)), 6) AS p_approx,
           2.0 * exp(-6.0 * k_stat * k_stat
                 / (CAST(n_days AS DOUBLE) * n_days * n_days
                    + CAST(n_days AS DOUBLE) * n_days)) < {_PT_SIG}
             AS significant
    FROM n CROSS JOIN k CROSS JOIN cp
    """,
)
def q_pettitt_test(spark, sf_dir):
    """R576 — Pettitt: U_t over every boundary via a boundary×(i,j)
    straddling-pair join (≤61³ combinations, no windows), K = max|U_t|
    with the EARLIEST boundary on ties, p ≈ 2·exp(−6K²/(n³+n²))."""
    ev = read_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    b = daily.select(F.col("d").alias("bound"))
    i = daily.select(F.col("d").alias("di"), F.col("x").alias("xi"))
    j = daily.select(F.col("d").alias("dj"), F.col("x").alias("xj"))
    u = (
        b.join(i, F.col("di") <= F.col("bound"))
        .join(j, F.col("dj") > F.col("bound"))
        .groupBy("bound")
        .agg(
            F.sum(
                F.when(F.col("xi") > F.col("xj"), 1)
                .when(F.col("xi") < F.col("xj"), -1)
                .otherwise(0)
            ).alias("u_t")
        )
    )
    k = u.agg(F.max(F.abs(F.col("u_t"))).alias("k_stat"))
    cp = (
        u.crossJoin(F.broadcast(k))
        .filter(F.abs(F.col("u_t")) == F.col("k_stat"))
        .agg(F.min("bound").alias("change_day"))
    )
    nd = F.col("n_days").cast("double")
    p_approx = 2.0 * F.exp(
        -6.0
        * F.col("k_stat")
        * F.col("k_stat")
        / (nd * nd * nd + nd * nd)
    )
    return (
        n.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(cp))
        .select(
            "n_days",
            F.date_format("change_day", "yyyy-MM-dd").alias("change_day"),
            "k_stat",
            F.round(p_approx, 6).alias("p_approx"),
            (p_approx < _PT_SIG).alias("significant"),
        )
    )


# ===========================================================================
# R577 — von Neumann successive-difference ratio
# ===========================================================================

@register(
    "q_von_neumann",
    f"""
    WITH daily AS ({_SQL_PT_DAILY}),
    rk AS (
      SELECT a.d, MAX(a.x) AS x, CAST(COUNT(*) AS BIGINT) AS r
      FROM daily a JOIN daily b ON b.d <= a.d
      GROUP BY a.d
    ),
    diffs AS (
      SELECT SUM((b.x - a.x) * (b.x - a.x)) AS ssd
      FROM rk a JOIN rk b ON b.r = a.r + 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ss
      FROM daily
    )
    SELECT n,
           round(ssd / (ss - CAST(s AS DOUBLE) * s / n), 6) AS eta,
           round((ssd / (ss - CAST(s AS DOUBLE) * s / n) - 2.0)
                 / sqrt(4.0 * (n - 2) / (CAST(n AS DOUBLE) * n - 1)), 6)
             AS z,
           abs((ssd / (ss - CAST(s AS DOUBLE) * s / n) - 2.0)
               / sqrt(4.0 * (n - 2) / (CAST(n AS DOUBLE) * n - 1)))
             < 1.96 AS random_ok
    FROM diffs CROSS JOIN m
    """,
)
def q_von_neumann(spark, sf_dir):
    """R577 — η = Σ(x_{{t+1}}−x_t)² / Σ(x_t−x̄)², E[η]=2 under
    randomness, z = (η−2)/sqrt(4(n−2)/(n²−1)) (the stated large-n
    variance), |z|<1.96 randomness bit.  Adjacency via the bounded
    rank self-join on the day frame — no windows."""
    ev = read_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    b = daily.select(F.col("d").alias("bd"))
    rk = (
        daily.join(b, F.col("bd") <= F.col("d"))
        .groupBy("d")
        .agg(F.max("x").alias("x"), F.count(F.lit(1)).alias("r"))
    )
    nxt = rk.select(
        (F.col("r") - 1).alias("rp"), F.col("x").alias("x_next")
    )
    diffs = rk.join(nxt, F.col("rp") == F.col("r")).agg(
        F.sum(
            (F.col("x_next") - F.col("x"))
            * (F.col("x_next") - F.col("x"))
        ).alias("ssd")
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    sxx = F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")
    eta = F.col("ssd") / sxx
    nn = F.col("n").cast("double")
    z = (eta - 2.0) / F.sqrt(4.0 * (F.col("n") - 2) / (nn * nn - 1))
    return diffs.crossJoin(F.broadcast(m)).select(
        "n",
        F.round(eta, 6).alias("eta"),
        F.round(z, 6).alias("z"),
        (F.abs(z) < 1.96).alias("random_ok"),
    )
