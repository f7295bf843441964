"""Round-5 registry additions, batch 105 — windowed market bars, the
iterative-optimizer shape, and symbolic series approximation:

- q_tumbling_ohlc: open/high/low/close/volume bars per (event_type, day)
  via min_by/max_by — ONE keyed aggregation computes first/last/extreme
  values simultaneously (the pre-max_by idiom was two extra self-joins).
- q_gd_linreg: full-batch gradient descent for 1-feature ridge-free
  linear regression — 5 unrolled iterations, each ONE aggregation
  producing the 2 gradient scalars with the current (w, b) as literals
  derived from the previous aggregation's CTE. The iterative-optimizer
  counterpart of q_ols_2var's closed form: this is exactly how
  distributed SGD/L-BFGS outer loops look at 100 TB (per-pass gradient
  agg, driver-side parameter update — here even the update stays in
  SQL/DataFrame land, nothing collected).
- q_sax_symbolic: Symbolic Aggregate approXimation of the daily
  event-count series: z-normalize → PAA into 8 segments → map segment
  means to 4 symbols at the standard-normal quartile breakpoints
  (±0.6745) — the time-series-mining alphabet for motif/anomaly search.
  Calendar-bounded aggs; the segment map is a closed-form bucket
  expression, no window.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_GD_ITERS = 5
_GD_LR = 0.02
_SAX_SEGS = 8
_SAX_BREAK = 0.6745  # N(0,1) quartiles → 4-symbol alphabet a<b<c<d


@register(
    "q_tumbling_ohlc",
    """
    SELECT event_type, date_trunc('day', ts) AS day,
           arg_min(value, ts) AS open,
           round(MAX(value), 4) AS high,
           round(MIN(value), 4) AS low,
           arg_max(value, ts) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           round(SUM(value), 4) AS notional
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_ohlc(spark, sf_dir):
    """OHLCV bars per (event_type, day): open/close = min_by/max_by on
    the event timestamp, high/low/volume plain extremes — one keyed
    aggregation, map-side combined (min_by/max_by carry a single
    (value, ts) pair per group per partition). Timestamps within a
    (type, day) are unique in this feed (microsecond grid), so the
    by-ts argmin/argmax is deterministic. The financial-bars shape for
    any tick store."""
    ev = read_events(spark, sf_dir)
    return ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.min_by("value", "ts").alias("open"),
        F.round(F.max("value"), 4).alias("high"),
        F.round(F.min("value"), 4).alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.round(F.sum("value"), 4).alias("notional"),
    )


def _sql_gd() -> str:
    """5 unrolled GD iterations as chained CTEs: g{i} holds (w, b);
    each step aggregates the full data with g{i-1}'s parameters."""
    steps = []
    prev = "g0"
    for i in range(1, _GD_ITERS + 1):
        steps.append(f"""
    g{i} AS (
      SELECT w - {_GD_LR} * (SELECT 2.0 / COUNT(*) *
                 SUM((w * x + b - y) * x) FROM pts, g{i - 1}) AS w,
             b - {_GD_LR} * (SELECT 2.0 / COUNT(*) *
                 SUM(w * x + b - y) FROM pts, g{i - 1}) AS b
      FROM g{i - 1}
    )""")
        prev = f"g{i}"
    return f"""
    WITH pts AS (
      SELECT CAST(n_chars AS DOUBLE) / 100.0 AS x,
             CAST(length(text) AS DOUBLE) / 100.0 AS y
      FROM documents
    ),
    g0 AS (SELECT CAST(0.0 AS DOUBLE) AS w, CAST(0.0 AS DOUBLE) AS b),{",".join(steps)}
    SELECT round(w, 6) AS w, round(b, 6) AS b,
           (SELECT round(AVG((w * x + b - y) * (w * x + b - y)), 6)
            FROM pts, {prev}) AS mse
    FROM {prev}
    """


@register("q_gd_linreg", _sql_gd())
def q_gd_linreg(spark, sf_dir):
    """Full-batch gradient descent, {it} iterations, lr={lr}: per
    iteration ONE aggregation computes ∂w = 2/n·Σ(ŷ−y)x and
    ∂b = 2/n·Σ(ŷ−y) with the incoming (w, b) cross-joined in as a
    1-row frame; the parameter update is a projection on that row.
    NOTHING is collected — the whole 5-step optimizer is one lazy plan
    whose only driver value is the final 3-number row, exactly the
    per-pass shape of distributed SGD at scale (gradient agg ↔
    parameter broadcast). Feature/target deliberately correlated
    (doc char counts) so the fit visibly converges — MSE asserted
    decreasing in tests.""".format(it=_GD_ITERS, lr=_GD_LR)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pts = docs.select(
        (F.col("n_chars").cast("double") / 100.0).alias("x"),
        (F.length("text").cast("double") / 100.0).alias("y"),
    )
    params = pts.sparkSession.createDataFrame([(0.0, 0.0)], "w double, b double")
    for _ in range(_GD_ITERS):
        g = (
            pts.crossJoin(F.broadcast(params))
            .agg(
                (
                    F.lit(2.0)
                    / F.count(F.lit(1))
                    * F.sum(
                        (F.col("w") * F.col("x") + F.col("b") - F.col("y"))
                        * F.col("x")
                    )
                ).alias("dw"),
                (
                    F.lit(2.0)
                    / F.count(F.lit(1))
                    * F.sum(F.col("w") * F.col("x") + F.col("b") - F.col("y"))
                ).alias("db"),
            )
        )
        params = (
            params.crossJoin(F.broadcast(g))
            .select(
                (F.col("w") - _GD_LR * F.col("dw")).alias("w"),
                (F.col("b") - _GD_LR * F.col("db")).alias("b"),
            )
        )
    return (
        pts.crossJoin(F.broadcast(params))
        .agg(
            F.round(F.first("w"), 6).alias("w"),
            F.round(F.first("b"), 6).alias("b"),
            F.round(
                F.avg(
                    (F.col("w") * F.col("x") + F.col("b") - F.col("y"))
                    * (F.col("w") * F.col("x") + F.col("b") - F.col("y"))
                ),
                6,
            ).alias("mse"),
        )
    )


@register(
    "q_sax_symbolic",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT AVG(y) AS mu, stddev_samp(y) AS sigma,
             min(d) AS d0, COUNT(*) AS n
      FROM daily
    ),
    z AS (
      SELECT CAST(floor(date_diff('day', stats.d0, daily.d)
                        * {_SAX_SEGS} * 1.0
                        / (date_diff('day', stats.d0,
                             (SELECT max(d) FROM daily)) + 1)) AS INTEGER)
               AS seg,
             (daily.y - stats.mu) / stats.sigma AS zy
      FROM daily CROSS JOIN stats
    ),
    paa AS (
      SELECT seg, AVG(zy) AS m, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM z GROUP BY seg
    )
    SELECT seg, round(m, 6) AS paa_mean, n_days,
           CASE WHEN m < -{_SAX_BREAK} THEN 'a'
                WHEN m < 0 THEN 'b'
                WHEN m < {_SAX_BREAK} THEN 'c'
                ELSE 'd' END AS symbol
    FROM paa
    """,
)
def q_sax_symbolic(spark, sf_dir):
    """SAX: z-normalize the daily count series, PAA-average it into
    {s} equal day-range segments, map each segment mean to a 4-symbol
    alphabet at the N(0,1) quartile breakpoints (±{b}) — the discrete
    representation behind time-series motif discovery and HOT-SAX
    anomaly search. Segment id is closed-form floor arithmetic on the
    day offset (no window, no rank); two calendar-bounded aggs
    total.""".format(s=_SAX_SEGS, b=_SAX_BREAK)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    stats = daily.agg(
        F.avg("y").alias("mu"),
        F.stddev_samp("y").alias("sigma"),
        F.min("d").alias("d0"),
        F.max("d").alias("dmax"),
    )
    z = daily.crossJoin(F.broadcast(stats)).select(
        F.floor(
            F.datediff("d", "d0")
            * _SAX_SEGS
            * F.lit(1.0)
            / (F.datediff("dmax", "d0") + 1)
        )
        .cast("int")
        .alias("seg"),
        ((F.col("y") - F.col("mu")) / F.col("sigma")).alias("zy"),
    )
    paa = z.groupBy("seg").agg(
        F.avg("zy").alias("m"), F.count(F.lit(1)).alias("n_days")
    )
    symbol = (
        F.when(F.col("m") < -_SAX_BREAK, "a")
        .when(F.col("m") < 0, "b")
        .when(F.col("m") < _SAX_BREAK, "c")
        .otherwise("d")
    )
    return paa.select(
        "seg",
        F.round("m", 6).alias("paa_mean"),
        "n_days",
        symbol.alias("symbol"),
    )
