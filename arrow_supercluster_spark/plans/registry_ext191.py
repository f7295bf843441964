"""Round-7 registry additions, batch 186 — one-pass mergeable summaries
(the sketches a 100 TB ingest keeps when it cannot keep the data):

- q_countmin: Count-Min sketch of per-user event counts (d=4 rows,
  w=32 buckets, portable affine bucket hashes) audited against the
  exact counts — per user the estimate, the overcount, and the
  never-undercounts guarantee bit.  The sketch counters are a 128-key
  rollup; merging shards is counter addition, which is why CM is THE
  frequency summary for distributed ingest.
- q_ams_f2: Alon-Matias-Szegedy second-moment (F2 = Σ count²) sketch —
  nine ±1-sign-hash estimators, median of three means of three —
  against exact F2, with the relative error shipped.  F2 is the
  self-join size / skew proxy a planner wants without a full count.
- q_reservoir_sample: Efraimidis-Spirakis weighted sampling without
  replacement — per document the key ln(u)/w with u a deterministic
  affine-hash uniform in (0,1] and w = n_chars; the sample IS the
  top-25 keys.  One TakeOrdered pass; no per-row state, no sequential
  reservoir — the distributed formulation of reservoir sampling.

At 100 TB: q_countmin/q_ams_f2 collapse the corpus once to the exact
per-key frame (the audit needs it anyway; the sketches themselves are
linear folds of that frame — 128 counters / 9 signed sums), and
q_reservoir_sample is a single scan into TakeOrderedAndProject (k=25
rows cross the wire per partition).  All hash arithmetic is exact
int64 (coefficients < 2^32, operands < 2^31), so both engines
evaluate identical integers; ln/pow derive from identical rationals
and outputs round to 4-6.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.sources.tables import read_events

_P = 2147483647  # Mersenne prime 2^31-1: affine-hash modulus
_CM_D, _CM_W = 4, 32
_AMS_GRID = [(i, i // 3) for i in range(9)]  # (estimator, group-of-3)
_RS_K = 25
_RS_MULT, _RS_ADD = 2654435761, 99991


def _cm_bucket_sql(j: str, key: str) -> str:
    return f"((100003 * {j} + 31) * ({key}) + 12345 * {j} + 7) % {_P} % {_CM_W}"


# ===========================================================================
# R554 — Count-Min sketch with exact-count audit
# ===========================================================================

@register(
    "q_countmin",
    f"""
    WITH exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    grid AS (SELECT j FROM (VALUES (0), (1), (2), (3)) g(j)),
    ub AS (
      SELECT user_id, n, j,
             {_cm_bucket_sql('j', f'user_id % {_P}')} AS bucket
      FROM exact CROSS JOIN grid
    ),
    counters AS (
      SELECT j, bucket, CAST(SUM(n) AS BIGINT) AS c
      FROM ub GROUP BY 1, 2
    )
    SELECT u.user_id, u.n AS exact_n,
           CAST(MIN(c.c) AS BIGINT) AS est,
           CAST(MIN(c.c) - u.n AS BIGINT) AS overcount,
           MIN(c.c) >= u.n AS never_undercounts
    FROM ub u JOIN counters c ON c.j = u.j AND c.bucket = u.bucket
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def q_countmin(spark, sf_dir):
    """R554 — Count-Min: bucket_j(key) = ((100003j+31)·key + 12345j+7)
    mod P mod 32, counters summed per (row, bucket), estimate =
    min over the d=4 rows.  Built FROM the exact per-user frame (sum
    is linear, so this equals folding the raw stream) — the corpus
    shuffles once on user_id; everything after is a 128-key rollup
    plus a broadcast-sized audit join."""
    exact = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = F.explode(F.array(*[F.lit(j) for j in range(_CM_D)])).alias("j")
    ub = exact.select(
        "user_id",
        "n",
        grid,
    ).withColumn(
        "bucket",
        (
            (100003 * F.col("j") + 31) * F.pmod("user_id", F.lit(_P))
            + 12345 * F.col("j")
            + 7
        )
        % _P
        % _CM_W,
    )
    counters = ub.groupBy("j", "bucket").agg(F.sum("n").alias("c"))
    return (
        ub.join(counters, ["j", "bucket"])
        .groupBy("user_id", "n")
        .agg(F.min("c").alias("est"))
        .select(
            "user_id",
            F.col("n").alias("exact_n"),
            "est",
            (F.col("est") - F.col("n")).alias("overcount"),
            (F.col("est") >= F.col("n")).alias("never_undercounts"),
        )
        .orderBy("user_id")
    )


# ===========================================================================
# R555 — AMS F2 sketch (median of means of ±1-sign estimators)
# ===========================================================================

_AMS_SIGN_SQL = (
    f"(1 - 2 * CAST(((100003 * i + 59) * (user_id % {_P}) + 31 * i + 11)"
    f" % {_P} % 2 AS BIGINT))"
)


@register(
    "q_ams_f2",
    f"""
    WITH exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    grid AS (
      SELECT i, grp FROM (VALUES
        {', '.join(f'({i}, {g})' for i, g in _AMS_GRID)}) g(i, grp)
    ),
    z AS (
      SELECT i, grp,
             CAST(SUM({_AMS_SIGN_SQL} * n) AS BIGINT) AS z
      FROM exact CROSS JOIN grid GROUP BY 1, 2
    ),
    gm AS (
      SELECT grp, AVG(CAST(z AS DOUBLE) * CAST(z AS DOUBLE)) AS m
      FROM z GROUP BY 1
    ),
    piv AS (
      SELECT MAX(CASE WHEN grp = 0 THEN m END) AS m0,
             MAX(CASE WHEN grp = 1 THEN m END) AS m1,
             MAX(CASE WHEN grp = 2 THEN m END) AS m2
      FROM gm
    ),
    med AS (
      SELECT m0, m1, m2,
             m0 + m1 + m2 - GREATEST(m0, m1, m2)
                          - LEAST(m0, m1, m2) AS median_est
      FROM piv
    ),
    f2 AS (
      SELECT SUM(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS exact_f2
      FROM exact
    )
    SELECT exact_f2,
           round(m0, 4) AS est_g0, round(m1, 4) AS est_g1,
           round(m2, 4) AS est_g2,
           round(median_est, 4) AS median_est,
           round(abs(median_est - exact_f2) / exact_f2, 6) AS rel_err
    FROM med CROSS JOIN f2
    """,
)
def q_ams_f2(spark, sf_dir):
    """R555 — AMS: sign_i(key) = 1 − 2·(((100003i+59)·key + 31i+11)
    mod P mod 2); Z_i = Σ sign_i·count, estimator Z_i², group mean of
    3, median of the 3 group means (sum − max − min).  Z stays exact
    int64; squares go to double (Z ≤ stream length, so Z² overflows
    int64 at ~10^9.5 — double is the scale-safe type)."""
    exact = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("i"), F.lit(g).alias("grp"))
                for i, g in _AMS_GRID
            ]
        )
    ).alias("ig")
    sign = 1 - 2 * (
        F.pmod(
            (100003 * F.col("i") + 59) * F.pmod("user_id", F.lit(_P))
            + 31 * F.col("i")
            + 11,
            F.lit(_P),
        )
        % 2
    )
    z = (
        exact.select("user_id", "n", grid)
        .select("user_id", "n", "ig.i", "ig.grp")
        .withColumn("s", sign)
        .groupBy("i", "grp")
        .agg(F.sum(F.col("s") * F.col("n")).alias("z"))
    )
    gm = z.groupBy("grp").agg(
        F.avg(F.col("z").cast("double") * F.col("z").cast("double")).alias(
            "m"
        )
    )
    piv = gm.agg(
        F.max(F.when(F.col("grp") == 0, F.col("m"))).alias("m0"),
        F.max(F.when(F.col("grp") == 1, F.col("m"))).alias("m1"),
        F.max(F.when(F.col("grp") == 2, F.col("m"))).alias("m2"),
    )
    f2 = exact.agg(
        F.sum(F.col("n").cast("double") * F.col("n").cast("double")).alias(
            "exact_f2"
        )
    )
    med = (
        F.col("m0")
        + F.col("m1")
        + F.col("m2")
        - F.greatest("m0", "m1", "m2")
        - F.least("m0", "m1", "m2")
    )
    return (
        piv.crossJoin(f2)
        .withColumn("median_raw", med)
        .select(
            "exact_f2",
            F.round("m0", 4).alias("est_g0"),
            F.round("m1", 4).alias("est_g1"),
            F.round("m2", 4).alias("est_g2"),
            F.round("median_raw", 4).alias("median_est"),
            F.round(
                F.abs(F.col("median_raw") - F.col("exact_f2"))
                / F.col("exact_f2"),
                6,
            ).alias("rel_err"),
        )
    )


# ===========================================================================
# R556 — Efraimidis-Spirakis weighted reservoir sample
# ===========================================================================

@register(
    "q_reservoir_sample",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln((({_RS_MULT} * (doc_id % {_P}) + {_RS_ADD}) % {_P} + 1)
                / {float(_P + 1)!r}) / n_chars AS es_key
      FROM documents WHERE n_chars > 0
    ),
    top AS (
      SELECT doc_id, n_chars, es_key
      FROM keyed ORDER BY es_key DESC, doc_id LIMIT {_RS_K}
    )
    SELECT CAST(row_number() OVER (ORDER BY es_key DESC, doc_id)
                AS BIGINT) AS rank,
           doc_id, n_chars, round(es_key, 6) AS es_key
    FROM top
    ORDER BY rank
    """,
)
def q_reservoir_sample(spark, sf_dir):
    """R556 — Efraimidis-Spirakis: u = ((2654435761·id + 99991) mod P
    + 1)/(P+1) ∈ (0,1], key = ln(u)/n_chars, sample = top-25 keys
    (heavier docs get keys nearer 0, hence higher inclusion odds —
    the weighted-without-replacement guarantee).  orderBy+limit →
    TakeOrderedAndProject; the rank window runs over the ≤25-row
    page (bounded, allowlisted)."""
    docs = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    u = (
        F.pmod(
            _RS_MULT * F.pmod("doc_id", F.lit(_P)) + _RS_ADD, F.lit(_P)
        )
        + 1
    ) / F.lit(float(_P + 1))
    keyed = docs.select(
        "doc_id", "n_chars", (F.log(u) / F.col("n_chars")).alias("es_key")
    )
    top = keyed.orderBy(F.desc("es_key"), F.asc("doc_id")).limit(_RS_K)
    w = Window.orderBy(F.desc("es_key"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "n_chars",
        F.round("es_key", 6).alias("es_key"),
    ).orderBy("rank")
