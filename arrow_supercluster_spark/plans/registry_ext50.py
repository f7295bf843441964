"""Round-2 registry additions, batch 45 — drift monitoring, calendar
dimensions, and contrastive pair generation:

- q_psi_drift: population stability index of the event-value deciles,
  first week vs rest — the industry drift alarm;
- q_date_dim: the generated calendar dimension (dow/week/month/quarter/
  weekend flags) joined back for weekend-lift measurement;
- q_negative_pairs: deterministic contrastive negative sampling — k
  hash-drawn negatives per document, self/duplicate-excluded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import pipeline
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# PSI drift
# ===========================================================================

_PSI_SPLIT = "2024-01-08"  # first week vs rest
_PSI_PS = [i / 10 for i in range(1, 10)]


@register(
    "q_psi_drift",
    f"""
    WITH v AS (
      SELECT value, CAST(ts < TIMESTAMP '{_PSI_SPLIT}' AS INTEGER) AS early
      FROM events WHERE value IS NOT NULL
    ),
    cuts AS (
      SELECT {", ".join(f"round(quantile_cont(value, {p}), 6) AS c{i}" for i, p in enumerate(_PSI_PS))}
      FROM v
    ),
    binned AS (
      SELECT early,
             1 {"".join(f" + CAST(value > c{i} AS INTEGER)" for i in range(len(_PSI_PS)))}
               AS bucket
      FROM v CROSS JOIN cuts
    ),
    counts AS (
      SELECT bucket,
             SUM(CASE WHEN early = 1 THEN 1 ELSE 0 END) AS n_early,
             SUM(CASE WHEN early = 0 THEN 1 ELSE 0 END) AS n_late
      FROM binned GROUP BY bucket
    ),
    tot AS (
      SELECT SUM(n_early) AS te, SUM(n_late) AS tl FROM counts
    )
    SELECT bucket, n_early, n_late,
           round((n_early * 1.0 / te - n_late * 1.0 / tl)
                 * ln((n_early * 1.0 / te) / (n_late * 1.0 / tl)), 9)
             AS psi_term
    FROM counts CROSS JOIN tot
    WHERE n_early > 0 AND n_late > 0
    """,
)
def q_psi_drift(spark, sf_dir):
    """Monitoring — population stability index of the value distribution
    between the first week and the rest of the stream: per overall-
    decile bucket, (p−q)·ln(p/q); Σ terms < 0.1 stable, > 0.25 action —
    the model-ops drift alarm (q_source_lang_kl's production-monitoring
    sibling). Decile cuts come from ONE percentile agg over the whole
    stream (broadcast back, the q_equidepth_hist idiom); bucketing is a
    narrow fold; counts collapse to 10 rows."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    v = ev.select(
        "value",
        (F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")).cast("int").alias("early"),
    )
    cuts = v.agg(
        *[
            F.round(F.expr(f"percentile(value, {p})"), 6).alias(f"c{i}")
            for i, p in enumerate(_PSI_PS)
        ]
    )
    bucket = F.lit(1)
    for i in range(len(_PSI_PS)):
        bucket = bucket + (F.col("value") > F.col(f"c{i}")).cast("int")
    binned = v.crossJoin(F.broadcast(cuts)).select(
        "early", bucket.alias("bucket")
    )
    counts = binned.groupBy("bucket").agg(
        F.sum(F.when(F.col("early") == 1, 1).otherwise(0)).alias("n_early"),
        F.sum(F.when(F.col("early") == 0, 1).otherwise(0)).alias("n_late"),
    )
    tot = counts.agg(
        F.sum("n_early").alias("te"), F.sum("n_late").alias("tl")
    )
    p = F.col("n_early") * 1.0 / F.col("te")
    q = F.col("n_late") * 1.0 / F.col("tl")
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter((F.col("n_early") > 0) & (F.col("n_late") > 0))
        .select(
            "bucket", "n_early", "n_late",
            F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
        )
    )


# ===========================================================================
# Date dimension
# ===========================================================================

@register(
    "q_date_dim",
    """
    WITH b AS (
      SELECT date_trunc('day', MIN(ts)) AS d0, date_trunc('day', MAX(ts)) AS d1
      FROM events
    ),
    dim AS (
      SELECT g.d,
             CAST(strftime(g.d, '%w') AS INTEGER) AS dow,
             CAST(strftime(g.d, '%m') AS INTEGER) AS month,
             CAST((CAST(strftime(g.d, '%m') AS INTEGER) + 2) / 3 AS INTEGER)
               AS quarter,
             CAST(CAST(strftime(g.d, '%w') AS INTEGER) IN (0, 6) AS INTEGER)
               AS is_weekend
      FROM b CROSS JOIN unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS g(d)
    ),
    daily AS (
      SELECT date_trunc('day', ts) AS d, COUNT(*) AS n,
             round(SUM(value), 4) AS sum_value
      FROM events GROUP BY 1
    )
    SELECT epoch_us(dim.d) AS day_us, dim.dow, dim.month, dim.quarter,
           dim.is_weekend,
           coalesce(daily.n, 0) AS n_events,
           coalesce(daily.sum_value, 0.0) AS sum_value
    FROM dim LEFT JOIN daily ON daily.d = dim.d
    """,
)
def q_date_dim(spark, sf_dir):
    """Warehouse — the generated CALENDAR DIMENSION (day-of-week, month,
    quarter, weekend flag over the stream's day span) left-joined to
    daily activity — the star-schema date dim every BI layer builds
    first, generated relationally (bounds agg + sequence explode, the
    calendar-gap pattern) instead of loaded from a CSV. Quarter uses
    integer arithmetic; dow matches strftime's 0=Sunday."""
    ev = read_events(spark, sf_dir)
    b = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    dim = b.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    ).select(
        "d",
        (F.dayofweek("d") - 1).alias("dow"),
        F.month("d").alias("month"),
        F.expr("CAST((month(d) + 2) / 3 AS INT)").alias("quarter"),
        (F.dayofweek("d") - 1).isin(0, 6).cast("int").alias("is_weekend"),
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )
    return dim.join(daily, "d", "left").select(
        F.unix_micros("d").alias("day_us"),
        "dow", "month", "quarter", "is_weekend",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


# ===========================================================================
# Negative sampling
# ===========================================================================

_NEG_K = 4


@register(
    "q_negative_pairs",
    f"""
    WITH n AS (SELECT MAX(doc_id) + 1 AS n_docs FROM documents),
    cand AS (
      SELECT d.doc_id AS a_id,
             ((d.doc_id * {_NEG_K} + j.j) * {pipeline.HASH_MULT})
               % {pipeline.HASH_MOD} % n.n_docs AS b_id,
             j.j AS draw
      FROM documents d
      CROSS JOIN n
      CROSS JOIN unnest(generate_series(0, {_NEG_K - 1})) AS j(j)
    )
    SELECT c.a_id, c.b_id, c.draw
    FROM cand c
    JOIN documents b ON b.doc_id = c.b_id
    WHERE c.b_id <> c.a_id
    """,
)
def q_negative_pairs(spark, sf_dir):
    """Training-pair generation — deterministic contrastive NEGATIVES:
    4 (_NEG_K) hash-drawn partner docs per anchor (portable Lehmer arithmetic
    — reproducible across engines/runs, unlike rand() sampling),
    self-pairs dropped, existence verified by a key join (the drawn id
    must be a real doc). At 100 TB the draw is a narrow map and the
    verify join is keyed by doc id — this is how batch-negative pools
    for embedding training are materialized without any shuffle of the
    text itself."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    cand = docs.select(
        F.col("doc_id").alias("a_id"),
        F.explode(F.sequence(F.lit(0), F.lit(_NEG_K - 1))).alias("draw"),
    ).select(
        "a_id",
        "draw",
        (
            ((F.col("a_id") * _NEG_K + F.col("draw")) * pipeline.HASH_MULT)
            % pipeline.HASH_MOD
            % n_docs
        ).alias("b_id"),
    )
    b = docs.select(F.col("doc_id").alias("b_id"))
    return (
        cand.join(b, "b_id")
        .filter(F.col("b_id") != F.col("a_id"))
        .select("a_id", "b_id", "draw")
    )
