"""Round-5 registry additions, batch 101 — skew-safe join surgery, two
classical hypothesis tests, spectral + recurrence time-series kernels,
and an order-insensitive dataset checksum:

- q_salted_join: the skew-salting pattern as a first-class, checked
  operator: the hot-keyed big side gets a salt column, the small side
  replicates across all salts, the join keys on (key, salt) — so one hot
  key spreads over S reducer partitions instead of stalling one task.
  Result ≡ the plain join (the oracle IS the plain join).
- q_welch_ttest: Welch's unequal-variance t-test (en vs non-en document
  lengths) — one aggregation, closed-form t and Welch–Satterthwaite df.
- q_dft_power: DFT power spectrum of the daily event-count series; the
  day index is date_diff from the series start (no window), each
  frequency's power is one sum — O(K·days), calendar-bounded.
- q_holt_linear: Holt's linear-trend double exponential smoothing. The
  coupled (level, trend) recurrence has no closed-form scan, but the
  daily frame is calendar-bounded, so the series collapses to ONE sorted
  array and the recurrence is an `aggregate` fold over it — a single-row
  job with NO window and NO driver loop. Oracle: recursive CTE.
- q_poisson_dispersion: index-of-dispersion test on daily counts
  (variance/mean, chi-square statistic) — the standard overdispersion
  screen before fitting count models.
- q_dataset_checksum: per-source corpus checksum that is ORDER-
  INSENSITIVE by construction (sum over docs of a position-weighted
  digest of md5(doc_id:normalized_text)) — a pure aggregation, so it
  scales as a map+combine with no collect and no sort, unlike a Merkle
  chain which needs ordered concatenation. The db-style "table hash"
  used to verify replicas/migrations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_NORM, _docs
from arrow_supercluster_spark.sources.tables import read_events

_SALTS = 8
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_DFT_K = 8


@register(
    "q_salted_join",
    """
    WITH dim AS (
      SELECT DISTINCT event_type, length(event_type) AS weight FROM events
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(SUM(e.value * d.weight), 4) AS weighted_sum
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_salted_join(spark, sf_dir):
    """Skew-salting demo, verified: event_type is a 5-value hot key — a
    plain shuffle join would hash all of 'click' into ONE reducer
    partition. Salted form: big side salt = pmod(event_id, S); small
    side explodes ×S; equi-join on (event_type, salt) spreads each hot
    key over S partitions. The aggregation is key-only afterwards, so
    the result is exactly the plain join's (the oracle). At 100 TB this
    is the difference between a 5-task stage and a balanced one; AQE
    skew-join does this adaptively, salting is the deterministic form."""
    ev = read_events(spark, sf_dir)
    dim = (
        ev.select("event_type").distinct()
        .withColumn("weight", F.length("event_type"))
    )
    dim_salted = dim.select(
        "event_type",
        "weight",
        F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1))).alias("salt"),
    )
    big = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(_SALTS)))
    return (
        big.join(dim_salted, ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value") * F.col("weight")), 4).alias(
                "weighted_sum"
            ),
        )
    )


@register(
    "q_welch_ttest",
    """
    WITH g AS (
      SELECT (lang = 'en') AS is_en,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(CAST(n_chars AS DOUBLE)) AS m,
             var_samp(CAST(n_chars AS DOUBLE)) AS v
      FROM documents GROUP BY 1
    )
    SELECT a.n AS n_en, b.n AS n_rest,
           round(a.m, 6) AS mean_en, round(b.m, 6) AS mean_rest,
           round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
           round(pow(a.v / a.n + b.v / b.n, 2)
                 / (pow(a.v / a.n, 2) / (a.n - 1)
                    + pow(b.v / b.n, 2) / (b.n - 1)), 6) AS df
    FROM (SELECT * FROM g WHERE is_en) a, (SELECT * FROM g WHERE NOT is_en) b
    """,
)
def q_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test: are en documents a different
    length than the rest? One grouped aggregation (two rows) then the
    closed-form statistic — at any corpus size this is a map+combine
    agg; nothing scales with rows except the scan."""
    g = (
        _docs(spark, sf_dir)
        .groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("n_chars").cast("double")).alias("m"),
            F.var_samp(F.col("n_chars").cast("double")).alias("v"),
        )
    )
    a = g.filter("is_en").select(
        F.col("n").alias("n_en"), F.col("m").alias("ma"), F.col("v").alias("va")
    )
    b = g.filter("NOT is_en").select(
        F.col("n").alias("n_rest"), F.col("m").alias("mb"), F.col("v").alias("vb")
    )
    se2 = F.col("va") / F.col("n_en") + F.col("vb") / F.col("n_rest")
    df = F.pow(se2, 2) / (
        F.pow(F.col("va") / F.col("n_en"), 2) / (F.col("n_en") - 1)
        + F.pow(F.col("vb") / F.col("n_rest"), 2) / (F.col("n_rest") - 1)
    )
    return a.crossJoin(b).select(
        "n_en",
        "n_rest",
        F.round("ma", 6).alias("mean_en"),
        F.round("mb", 6).alias("mean_rest"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(df, 6).alias("df"),
    )


@register(
    "q_dft_power",
    f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    span AS (SELECT min(d) AS d0, date_diff('day', min(d), max(d)) + 1 AS n
             FROM daily),
    idx AS (
      SELECT date_diff('day', span.d0, daily.d) AS t, daily.y, span.n
      FROM daily CROSS JOIN span
    ),
    k AS (SELECT unnest(generate_series(1, {_DFT_K})) AS k)
    SELECT k.k,
           round(pow(SUM(idx.y * cos(2 * pi() * k.k * idx.t / idx.n)), 2)
                 + pow(SUM(idx.y * sin(2 * pi() * k.k * idx.t / idx.n)), 2),
                 4) AS power
    FROM idx CROSS JOIN k
    GROUP BY k.k
    """,
)
def q_dft_power(spark, sf_dir):
    """DFT power spectrum of the daily event-count series, frequencies
    k=1..{k}: P_k = (Σ y_t cos(2πkt/n))² + (Σ y_t sin(2πkt/n))². The
    day index is date_diff from the series start (missing days are
    implicit zeros) — NO window, no rank; the whole thing is a
    calendar-bounded agg crossed with {k} literal frequencies. The
    periodicity screen behind q_seasonality's fixed-period decomposition
    — this one FINDS the period.""".format(k=_DFT_K)
    import math

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    span = daily.agg(
        F.min("d").alias("d0"),
        (F.datediff(F.max("d"), F.min("d")) + 1).alias("n"),
    )
    idx = daily.crossJoin(F.broadcast(span)).select(
        F.datediff(F.col("d"), F.col("d0")).alias("t"), "y", "n"
    )
    ks = spark.range(1, _DFT_K + 1).select(F.col("id").cast("int").alias("k"))
    ang = (
        F.lit(2 * math.pi) * F.col("k") * F.col("t") / F.col("n")
    )
    return (
        idx.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.round(
                F.pow(F.sum(F.col("y") * F.cos(ang)), 2)
                + F.pow(F.sum(F.col("y") * F.sin(ang)), 2),
                4,
            ).alias("power")
        )
    )


@register(
    "q_holt_linear",
    f"""
    WITH RECURSIVE daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM idx),
    rec AS (
      SELECT 2 AS t,
             i2.y * {_HOLT_ALPHA}
               + (1 - {_HOLT_ALPHA}) * (i1.y + (i2.y - i1.y)) AS l,
             {_HOLT_BETA} * (i2.y * {_HOLT_ALPHA}
               + (1 - {_HOLT_ALPHA}) * (i1.y + (i2.y - i1.y)) - i1.y)
               + (1 - {_HOLT_BETA}) * (i2.y - i1.y) AS b
      FROM (SELECT y FROM idx WHERE t = 1) i1,
           (SELECT y FROM idx WHERE t = 2) i2
      UNION ALL
      SELECT r.t + 1,
             i.y * {_HOLT_ALPHA} + (1 - {_HOLT_ALPHA}) * (r.l + r.b),
             {_HOLT_BETA} * (i.y * {_HOLT_ALPHA}
               + (1 - {_HOLT_ALPHA}) * (r.l + r.b) - r.l)
               + (1 - {_HOLT_BETA}) * r.b
      FROM rec r JOIN idx i ON i.t = r.t + 1
    )
    SELECT n.n_days,
           round(r.l, 6) AS level, round(r.b, 6) AS trend,
           round(r.l + 7 * r.b, 6) AS forecast_7
    FROM rec r CROSS JOIN n WHERE r.t = n.n_days
    """,
)
def q_holt_linear(spark, sf_dir):
    """Holt linear-trend smoothing (α={a}, β={b}) over daily counts:
    lₜ = αyₜ + (1−α)(lₜ₋₁+bₜ₋₁); bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁;
    init l₁=y₁, b₁=y₂−y₁. The coupled recurrence has no closed-form
    scan, but the daily series is calendar-bounded (10³ rows/3 years),
    so it collapses to ONE sorted array inside a single-row aggregation
    and the recurrence runs as an `aggregate` fold — no window, no
    driver loop, no collect; the only corpus-sized stage is the daily
    count agg. Oracle: recursive CTE, identical association order →
    round(6).""".format(a=_HOLT_ALPHA, b=_HOLT_BETA)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "y"))).alias("s")
    )
    a, b = _HOLT_ALPHA, _HOLT_BETA
    fold = F.aggregate(
        F.slice(F.col("ys"), 3, F.size("ys")),
        F.struct(
            (
                F.element_at("ys", 2) * F.lit(a)
                + F.lit(1 - a)
                * (
                    F.element_at("ys", 1)
                    + (F.element_at("ys", 2) - F.element_at("ys", 1))
                )
            ).alias("l"),
            (
                F.lit(b)
                * (
                    F.element_at("ys", 2) * F.lit(a)
                    + F.lit(1 - a)
                    * (
                        F.element_at("ys", 1)
                        + (F.element_at("ys", 2) - F.element_at("ys", 1))
                    )
                    - F.element_at("ys", 1)
                )
                + F.lit(1 - b)
                * (F.element_at("ys", 2) - F.element_at("ys", 1))
            ).alias("t"),
        ),
        lambda acc, y: F.struct(
            (y * F.lit(a) + F.lit(1 - a) * (acc["l"] + acc["t"])).alias("l"),
            (
                F.lit(b)
                * (y * F.lit(a) + F.lit(1 - a) * (acc["l"] + acc["t"]) - acc["l"])
                + F.lit(1 - b) * acc["t"]
            ).alias("t"),
        ),
    )
    return (
        series.select(
            F.transform(F.col("s"), lambda r: r["y"]).alias("ys")
        )
        .select(F.size("ys").alias("n_days"), fold.alias("st"))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.round(F.col("st")["l"], 6).alias("level"),
            F.round(F.col("st")["t"], 6).alias("trend"),
            F.round(F.col("st")["l"] + 7 * F.col("st")["t"], 6).alias(
                "forecast_7"
            ),
        )
    )


@register(
    "q_poisson_dispersion",
    """
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           round(AVG(y), 6) AS mean_count,
           round(var_samp(y), 6) AS var_count,
           round(var_samp(y) / AVG(y), 6) AS dispersion,
           round((COUNT(*) - 1) * var_samp(y) / AVG(y), 6) AS chi2_stat
    FROM daily
    """,
)
def q_poisson_dispersion(spark, sf_dir):
    """Index-of-dispersion (Poisson overdispersion) test on daily event
    counts: D = s²/ȳ, χ² = (n−1)·D against χ²(n−1) — the standard
    screen before fitting count models. One calendar-bounded agg."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.avg("y"), 6).alias("mean_count"),
        F.round(F.var_samp("y"), 6).alias("var_count"),
        F.round(F.var_samp("y") / F.avg("y"), 6).alias("dispersion"),
        F.round(
            (F.count(F.lit(1)) - 1) * F.var_samp("y") / F.avg("y"), 6
        ).alias("chi2_stat"),
    )


@register(
    "q_dataset_checksum",
    f"""
    WITH leafs AS (
      SELECT source,
             md5(concat(CAST(doc_id AS VARCHAR), ':', {SQL_NORM})) AS h
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(list_sum(list_transform(range(1, 33),
                i -> i * ascii(substr(h, i, 1))))) AS BIGINT) AS checksum
    FROM leafs GROUP BY source
    """,
)
def q_dataset_checksum(spark, sf_dir):
    """Per-source dataset checksum, order-insensitive by construction:
    leaf digest = position-weighted byte sum of md5(doc_id:normalized
    text); shard checksum = SUM of leaf digests. Because the combiner is
    commutative the whole thing is one map+combine aggregation — no
    sort, no collect, no ordered concatenation (a Merkle chain would
    need one) — which is why replica/migration verification at 100 TB
    uses exactly this "table hash" shape. Any dropped, duplicated, or
    altered row moves the sum."""
    from arrow_supercluster_spark.operators.dedup import normalize_text

    leafs = _docs(spark, sf_dir).select(
        "source",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                normalize_text(F.col("text")),
            )
        ).alias("h"),
    )
    leafv = F.expr(
        "aggregate(sequence(1, 32), 0L, (acc, i) -> acc + i * ascii(substr(h, i, 1)))"
    )
    return leafs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(leafv).alias("checksum"),
    )
