"""Round-6 registry additions, batch 155 — storage-engine analytics:
theta sketches, bitmap indexes, and timestamp compression modeling:

- q_theta_sketch: KMV/theta-sketch cardinality estimation with SET
  OPERATIONS — k-minimum portable hashes per user cohort (heavy
  purchasers / error-prone), θ = k-th minimum, union via the combined
  k smallest, intersection via the θ-cut match count. The sketch
  family behind Druid/DataSketches set algebra; q_hll_portable and
  q_kmv_sketch estimate ONE set's cardinality — this one estimates
  |A∩B| without ever materializing the intersection.
- q_bitmap_index: bitmap-index semantics over the user dimension —
  each event type's user set becomes (word, 62-bit mask) rows via
  BIT_OR aggregation; AND/OR/count queries are popcounts over a
  word-aligned equi-join. The roaring-bitmap plan shape: set algebra
  as integer ops, |words| = |universe|/62 rows per type.
- q_gorilla_bits: Gorilla (Facebook 2015) timestamp-compression cost
  model over per-user event streams — delta-of-delta bucketed into
  the paper's 1/9/12/16/36-bit classes, total and per-timestamp bits
  vs the raw 64-bit baseline. The "should we even build this
  encoding" estimate, computed as two windows and a CASE.

At 100 TB: sketches move k rows per cohort; bitmaps move |users|/62
words per type; the compression model is one sort-shuffle on
(user, ts) — the sessionizer's shuffle — then per-row arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_TS_K = 32  # sketch size
_TS_P = 2147483647
_BI_WORD = 62  # bits per bitmap word (shift-safe in both engines)


# ===========================================================================
# R458 — theta sketch set algebra
# ===========================================================================

_SQL_COHORTS = """
    cohorts AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
               AS in_a,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) >= 13
               AS in_b
      FROM events GROUP BY user_id
    ),
    hashed AS (
      SELECT user_id, in_a, in_b,
             ((user_id * 48271 + 11) % 2147483647) * 1.0 / 2147483647
               AS h
      FROM cohorts WHERE in_a OR in_b
    )
"""


@register(
    "q_theta_sketch",
    f"""
    WITH {_SQL_COHORTS},
    sa AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h, user_id) AS rk
      FROM hashed WHERE in_a
    ),
    sb AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h, user_id) AS rk
      FROM hashed WHERE in_b
    ),
    ka AS (SELECT h FROM sa WHERE rk <= {_TS_K}),
    kb AS (SELECT h FROM sb WHERE rk <= {_TS_K}),
    theta AS (
      SELECT
        CASE WHEN (SELECT COUNT(*) FROM ka) < {_TS_K} THEN 1.0
             ELSE (SELECT MAX(h) FROM ka) END AS ta,
        CASE WHEN (SELECT COUNT(*) FROM kb) < {_TS_K} THEN 1.0
             ELSE (SELECT MAX(h) FROM kb) END AS tb
    ),
    est AS (
      SELECT
        CASE WHEN ta = 1.0 THEN (SELECT COUNT(*) FROM ka)
             ELSE ({_TS_K} - 1) / ta END AS est_a,
        CASE WHEN tb = 1.0 THEN (SELECT COUNT(*) FROM kb)
             ELSE ({_TS_K} - 1) / tb END AS est_b,
        least(ta, tb) AS t,
        (SELECT COUNT(*) FROM ka JOIN kb USING (h)
          WHERE h < least(theta.ta, theta.tb)) / least(ta, tb)
          AS est_inter
      FROM theta
    )
    SELECT CAST((SELECT COUNT(*) FROM hashed WHERE in_a) AS BIGINT)
             AS exact_a,
           CAST((SELECT COUNT(*) FROM hashed WHERE in_b) AS BIGINT)
             AS exact_b,
           CAST((SELECT COUNT(*) FROM hashed WHERE in_a AND in_b)
                AS BIGINT) AS exact_inter,
           round(est_a, 4) AS est_a,
           round(est_b, 4) AS est_b,
           round(est_inter, 4) AS est_inter
    FROM est
    """,
)
def q_theta_sketch(spark, sf_dir):
    """R458 — theta sketches for the heavy-purchaser (A) and
    error-prone (B) user cohorts: portable hash h(u) = ((48271u+11)
    mod p)/p, per-cohort KMV of size k={k} (θ = k-th minimum; exact
    mode θ=1 below k), estimates (k−1)/θ, and the intersection via the
    θ-cut: |{{h ∈ K_A ∩ K_B : h < min(θ_A,θ_B)}}| / θ. Exact counts
    shipped beside the estimates so the driver differential also
    certifies the error. Sketch join moves ≤ 2k rows.""".format(k=_TS_K)
    ev = read_events(spark, sf_dir)
    cohorts = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ) >= 14
        ).alias("in_a"),
        (
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ) >= 13
        ).alias("in_b"),
    )
    hashed = cohorts.filter(F.col("in_a") | F.col("in_b")).select(
        "user_id",
        "in_a",
        "in_b",
        (
            ((F.col("user_id") * 48271 + 11) % _TS_P) * 1.0 / _TS_P
        ).alias("h"),
    )
    # k smallest hashes per cohort via sort+limit — Spark plans this as
    # TakeOrdered (per-partition top-k then a k-row merge), NOT a global
    # window; (h, user_id) ordering keeps the cut deterministic
    ka = (
        hashed.filter("in_a")
        .orderBy("h", "user_id")
        .limit(_TS_K)
        .select("h")
    )
    kb = (
        hashed.filter("in_b")
        .orderBy("h", "user_id")
        .limit(_TS_K)
        .select("h")
    )
    na = ka.agg(
        F.count(F.lit(1)).alias("ca"), F.max("h").alias("ma")
    )
    nb = kb.agg(
        F.count(F.lit(1)).alias("cb"), F.max("h").alias("mb")
    )
    theta = na.crossJoin(F.broadcast(nb)).select(
        F.when(F.col("ca") < _TS_K, 1.0).otherwise(F.col("ma")).alias("ta"),
        F.when(F.col("cb") < _TS_K, 1.0).otherwise(F.col("mb")).alias("tb"),
        "ca",
        "cb",
    )
    inter_cnt = (
        ka.join(kb, "h")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.least(F.col("ta"), F.col("tb")))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    exact = hashed.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0))
        .cast("long").alias("exact_a"),
        F.sum(F.when(F.col("in_b"), 1).otherwise(0))
        .cast("long").alias("exact_b"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0))
        .cast("long").alias("exact_inter"),
    )
    j = (
        exact.crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(inter_cnt))
    )
    est_a = F.when(
        F.col("ta") == 1.0, F.col("ca").cast("double")
    ).otherwise((_TS_K - 1) / F.col("ta"))
    est_b = F.when(
        F.col("tb") == 1.0, F.col("cb").cast("double")
    ).otherwise((_TS_K - 1) / F.col("tb"))
    return j.select(
        "exact_a",
        "exact_b",
        "exact_inter",
        F.round(est_a, 4).alias("est_a"),
        F.round(est_b, 4).alias("est_b"),
        F.round(
            F.col("ni") / F.least(F.col("ta"), F.col("tb")), 4
        ).alias("est_inter"),
    )


# ===========================================================================
# R459 — bitmap index set algebra
# ===========================================================================

@register(
    "q_bitmap_index",
    f"""
    WITH bits AS (
      SELECT DISTINCT event_type AS t,
             user_id // {_BI_WORD} AS word,
             CAST(user_id % {_BI_WORD} AS BIGINT) AS bit
      FROM events
    ),
    bitmap AS (
      SELECT t, word, bit_or(CAST(1 AS BIGINT) << bit) AS mask
      FROM bits GROUP BY t, word
    ),
    pairs AS (
      SELECT a.t AS type_a, b.t AS type_b,
             SUM(bit_count(a.mask & b.mask)) AS n_and,
             SUM(bit_count(a.mask)) AS pa,
             SUM(bit_count(b.mask)) AS pb
      FROM bitmap a JOIN bitmap b
        ON a.word = b.word AND a.t < b.t
      GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(pa AS BIGINT) AS n_a_shared_words,
           CAST(pb AS BIGINT) AS n_b_shared_words,
           CAST(n_and AS BIGINT) AS n_and,
           round(n_and * 1.0 /
                 ((SELECT SUM(bit_count(mask)) FROM bitmap
                   WHERE t = type_a)
                  + (SELECT SUM(bit_count(mask)) FROM bitmap
                     WHERE t = type_b) - n_and), 6) AS jaccard
    FROM pairs ORDER BY type_a, type_b
    """,
)
def q_bitmap_index(spark, sf_dir):
    """R459 — bitmap-index set algebra over the user dimension: each
    event type's user set packs into (word = id//{w}, mask = BIT_OR of
    1<<(id%{w})) rows — {w}-bit words keep the shift inside the int64
    positive range in both engines. AND counts come from
    popcount(a&b) over the word equi-join; OR via inclusion-exclusion
    with the per-type popcount totals. 10 type pairs out; the bitmap
    table is |users|/{w} rows per type — the roaring-bitmap shape
    with set ops as whole-stage-codegen integer ops.""".format(
        w=_BI_WORD
    )
    ev = read_events(spark, sf_dir)
    bits = ev.select(
        F.col("event_type").alias("t"),
        (F.col("user_id") / _BI_WORD).cast("long").alias("word"),
        (F.col("user_id") % _BI_WORD).cast("long").alias("bit"),
    ).distinct()
    bitmap = bits.groupBy("t", "word").agg(
        F.expr("bit_or(CAST(1 AS BIGINT) << CAST(bit AS INT))").alias(
            "mask"
        )
    )
    totals = bitmap.groupBy("t").agg(
        F.sum(F.bit_count("mask")).alias("tot")
    )
    a = bitmap.select(
        F.col("t").alias("type_a"), "word", F.col("mask").alias("am")
    )
    b = bitmap.select(
        F.col("t").alias("type_b"), "word", F.col("mask").alias("bm")
    )
    pairs = (
        a.join(b, "word")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(
                F.bit_count(F.col("am").bitwiseAND(F.col("bm")))
            ).alias("n_and"),
            F.sum(F.bit_count("am")).alias("pa"),
            F.sum(F.bit_count("bm")).alias("pb"),
        )
    )
    ta = totals.select(
        F.col("t").alias("type_a"), F.col("tot").alias("tot_a")
    )
    tb = totals.select(
        F.col("t").alias("type_b"), F.col("tot").alias("tot_b")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("pa").cast("long").alias("n_a_shared_words"),
            F.col("pb").cast("long").alias("n_b_shared_words"),
            F.col("n_and").cast("long").alias("n_and"),
            F.round(
                F.col("n_and") * 1.0
                / (F.col("tot_a") + F.col("tot_b") - F.col("n_and")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ===========================================================================
# R460 — Gorilla timestamp-compression cost model
# ===========================================================================

@register(
    "q_gorilla_bits",
    """
    WITH seq AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tp,
             LAG(CAST(floor(epoch(ts)) AS BIGINT), 2)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tpp
      FROM events
    ),
    bits AS (
      SELECT CASE
        WHEN rn = 1 THEN 64
        WHEN rn = 2 THEN 14
        WHEN (t - tp) - (tp - tpp) = 0 THEN 1
        WHEN (t - tp) - (tp - tpp) BETWEEN -63 AND 64 THEN 9
        WHEN (t - tp) - (tp - tpp) BETWEEN -255 AND 256 THEN 12
        WHEN (t - tp) - (tp - tpp) BETWEEN -2047 AND 2048 THEN 16
        ELSE 36 END AS b,
        CASE WHEN rn <= 2 THEN NULL
             ELSE (t - tp) - (tp - tpp) END AS dod
      FROM seq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_timestamps,
           CAST(SUM(b) AS BIGINT) AS total_bits,
           round(SUM(b) * 1.0 / COUNT(*), 4) AS bits_per_ts,
           round(64.0 * COUNT(*) / SUM(b), 4) AS compression_ratio,
           CAST(SUM(CASE WHEN dod = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_dod,
           CAST(SUM(CASE WHEN dod IS NOT NULL
                          AND dod BETWEEN -63 AND 64 AND dod != 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_small_dod
    FROM bits
    """,
)
def q_gorilla_bits(spark, sf_dir):
    """R460 — Gorilla timestamp-compression cost model over per-user
    event streams: whole-second timestamps, delta-of-delta bucketed
    into the paper's classes ('0' → 1 bit; '10'+7 → 9; '110'+9 → 12;
    '1110'+12 → 16; '1111'+32 → 36; stream head 64, first delta 14).
    Reports total bits, bits/timestamp, the ×64 compression ratio,
    and the zero/small-dod mix that explains it. One (user, ts)
    sort-shuffle — the sessionizer's shuffle — then pure expressions;
    the storage-planning estimate you run BEFORE building the
    encoder."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_timestamp("ts")
    seq = ev.select(
        t.alias("t"),
        F.row_number().over(w).alias("rn"),
        F.lag(t).over(w).alias("tp"),
        F.lag(t, 2).over(w).alias("tpp"),
    )
    dod = (F.col("t") - F.col("tp")) - (F.col("tp") - F.col("tpp"))
    b = (
        F.when(F.col("rn") == 1, 64)
        .when(F.col("rn") == 2, 14)
        .when(dod == 0, 1)
        .when(dod.between(-63, 64), 9)
        .when(dod.between(-255, 256), 12)
        .when(dod.between(-2047, 2048), 16)
        .otherwise(36)
    )
    bits = seq.select(
        b.alias("b"),
        F.when(F.col("rn") <= 2, F.lit(None).cast("long"))
        .otherwise(dod).alias("dod"),
    )
    return bits.agg(
        F.count(F.lit(1)).alias("n_timestamps"),
        F.sum("b").cast("long").alias("total_bits"),
        F.round(F.sum("b") * 1.0 / F.count(F.lit(1)), 4).alias(
            "bits_per_ts"
        ),
        F.round(64.0 * F.count(F.lit(1)) / F.sum("b"), 4).alias(
            "compression_ratio"
        ),
        F.sum(F.when(F.col("dod") == 0, 1).otherwise(0))
        .cast("long").alias("n_zero_dod"),
        F.sum(
            F.when(
                F.col("dod").isNotNull()
                & F.col("dod").between(-63, 64)
                & (F.col("dod") != 0),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_small_dod"),
    )
