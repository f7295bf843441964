"""Round-2 registry additions, batch 24 — relational linear algebra,
experimentation, and concentration profiling:

- q_power_iteration: dominant eigenvector of the embedding covariance
  (Gram) matrix via 3 relational power-iteration rounds — the PCA/
  spectral primitive, oracle-unrolled like PageRank;
- q_ab_test: deterministic-assignment two-proportion z-test on purchase
  conversion — the experimentation readout;
- q_gini: Gini concentration of document counts by source and language
  — the corpus-balance metric behind mixture tuning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Power iteration
# ===========================================================================

_PI_ITERS = 3
_PI_DIM = 64


def _sql_pi_iter(prev: str, i: int) -> str:
    """One round: s = X v (in-row per vector), w = Xᵀ s (dim-keyed agg),
    v' = w / ||w||; w and the norm re-round so engine-dependent summation
    order cannot compound (the PageRank discipline)."""
    return f"""
    s{i} AS (
      SELECT e.vec_id,
             SUM(CAST(e.embedding[x.d] AS DOUBLE) * v.v) AS s
      FROM emb e
      CROSS JOIN unnest(generate_series(1, {_PI_DIM})) AS x(d)
      JOIN {prev} v ON v.d = x.d
      GROUP BY e.vec_id
    ),
    w{i} AS (
      SELECT x.d, round(SUM(CAST(e.embedding[x.d] AS DOUBLE) * s.s), 6) AS w
      FROM emb e
      CROSS JOIN unnest(generate_series(1, {_PI_DIM})) AS x(d)
      JOIN s{i} s ON s.vec_id = e.vec_id
      GROUP BY x.d
    ),
    n{i} AS (SELECT round(sqrt(SUM(w * w)), 6) AS nrm FROM w{i}),
    v{i} AS (
      SELECT d, round(w / nrm, 6) AS v FROM w{i} CROSS JOIN n{i}
    )"""


_PI_SQL = (
    f"""
    WITH emb AS (SELECT vec_id, embedding FROM embeddings),
    v0 AS (
      SELECT d, CAST(1.0 AS DOUBLE) / sqrt({_PI_DIM}.0) AS v
      FROM unnest(generate_series(1, {_PI_DIM})) AS t(d)
    ),"""
    + ",".join(_sql_pi_iter(f"v{i}", i + 1) for i in range(_PI_ITERS))
    + f" SELECT d, v FROM v{_PI_ITERS}"
)


@register("q_power_iteration", _PI_SQL)
def q_power_iteration(spark, sf_dir):
    """Linear algebra — dominant eigenvector of the embeddings' Gram
    matrix XᵀX by 3 power-iteration rounds, fully relational (the PCA
    first component / spectral-embedding primitive). Per round: s = Xv
    is a dim-keyed join + vec-keyed agg; w = Xᵀs is the transpose join +
    dim-keyed agg (64 rows); normalization is a 1-row agg. The vector
    side stays 64 rows — broadcast-joined against the exploded matrix,
    which shuffles keyed by vec/dim only. w, ‖w‖ and v re-round to 6
    each iteration so engine/partition-dependent float summation order
    cannot compound across rounds (the q_pagerank discipline); the
    oracle unrolls the same three rounds as CTEs. Note: the synthetic
    embeddings are near-isotropic (λ1/λ2 ≈ 1.017), so three rounds are
    a differential check of the iteration ALGEBRA, not a converged
    eigenvector — iteration count is the caller's convergence knob; the
    Rayleigh quotient provably climbs each round (tested)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id", (F.col("pos") + 1).alias("d"), F.col("val").cast("double").alias("val")
    )
    v = spark.range(1, _PI_DIM + 1).select(
        F.col("id").cast("int").alias("d"),
        (F.lit(1.0) / F.sqrt(F.lit(float(_PI_DIM)))).alias("v"),
    )
    for _ in range(_PI_ITERS):
        s = (
            x.join(F.broadcast(v), "d")
            .groupBy("vec_id")
            .agg(F.sum(F.col("val") * F.col("v")).alias("s"))
        )
        w = (
            x.join(s, "vec_id")
            .groupBy("d")
            .agg(F.round(F.sum(F.col("val") * F.col("s")), 6).alias("w"))
        )
        nrm = w.agg(F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), 6).alias("nrm"))
        v = w.crossJoin(F.broadcast(nrm)).select(
            "d", F.round(F.col("w") / F.col("nrm"), 6).alias("v")
        )
    return v


# ===========================================================================
# Two-proportion z-test
# ===========================================================================

@register(
    "q_ab_test",
    """
    WITH assign AS (
      SELECT user_id, user_id % 2 AS grp,
             MAX(CASE WHEN event_type = 'purchase' AND value > 90
                     THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2
    ),
    g AS (
      SELECT grp, COUNT(*) AS n, SUM(conv) AS k,
             SUM(conv) * 1.0 / COUNT(*) AS p
      FROM assign GROUP BY 1
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN grp = 0 THEN n END) AS n0,
        MAX(CASE WHEN grp = 0 THEN k END) AS k0,
        MAX(CASE WHEN grp = 0 THEN p END) AS p0,
        MAX(CASE WHEN grp = 1 THEN n END) AS n1,
        MAX(CASE WHEN grp = 1 THEN k END) AS k1,
        MAX(CASE WHEN grp = 1 THEN p END) AS p1
      FROM g
    )
    , se AS (
      SELECT *, sqrt(((k0 + k1) * 1.0 / (n0 + n1))
                 * (1.0 - (k0 + k1) * 1.0 / (n0 + n1))
                 * (1.0 / n0 + 1.0 / n1)) AS s
      FROM wide
    )
    SELECT n0, k0, round(p0, 6) AS p0, n1, k1, round(p1, 6) AS p1,
           CASE WHEN s > 0 THEN round((p1 - p0) / s, 6) END AS z,
           CASE WHEN s > 0 THEN abs((p1 - p0) / s) > 1.96 END AS significant
    FROM se
    """,
)
def q_ab_test(spark, sf_dir):
    """Experimentation — two-proportion z-test on purchase (purchase with
    value > 90 — the plain any-purchase rate saturates at 1.0 on this
    stream, a zero-variance degenerate) between DETERMINISTIC assignment arms (user_id parity — reproducible
    across runs/engines, unlike rand() splits): pooled-variance z and a
    5%-level verdict. One user-keyed agg collapses the stream, one
    2-row agg produces the arms, the statistic is a 1-row projection —
    the fact table shuffles once on user_id."""
    ev = read_events(spark, sf_dir)
    assign = ev.groupBy(
        "user_id", (F.col("user_id") % 2).alias("grp")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("conv")
    )
    g = assign.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").alias("k"),
        (F.sum("conv") * 1.0 / F.count(F.lit(1))).alias("p"),
    )
    wide = g.agg(
        *[
            F.max(F.when(F.col("grp") == i, F.col(c))).alias(f"{c}{i}")
            for i in (0, 1)
            for c in ("n", "k", "p")
        ]
    )
    pool = (F.col("k0") + F.col("k1")) * 1.0 / (F.col("n0") + F.col("n1"))
    se = F.sqrt(pool * (1.0 - pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1")))
    z = (F.col("p1") - F.col("p0")) / F.col("s")
    return wide.withColumn("s", se).select(
        "n0", "k0", F.round("p0", 6).alias("p0"),
        "n1", "k1", F.round("p1", 6).alias("p1"),
        F.when(F.col("s") > 0, F.round(z, 6)).alias("z"),
        F.when(F.col("s") > 0, F.abs(z) > 1.96).alias("significant"),
    )


# ===========================================================================
# Gini concentration
# ===========================================================================

_SQL_GINI_ONE = """
    SELECT '{dim}' AS dimension,
           round((2.0 * SUM(rk * c) - (cnt + 1.0) * SUM(c))
                 / (cnt * SUM(c)), 6) AS gini
    FROM (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS rk,
             COUNT(*) OVER () AS cnt
      FROM (SELECT {col} AS k, COUNT(*) AS c FROM documents GROUP BY 1)
    )
    GROUP BY cnt
"""


@register(
    "q_gini",
    _SQL_GINI_ONE.format(dim="source", col="source")
    + " UNION ALL "
    + _SQL_GINI_ONE.format(dim="lang", col="lang"),
)
def q_gini(spark, sf_dir):
    """Profiling — Gini concentration of document counts by source and
    by language: G = (2·Σ rᵢxᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over the
    ascending-sorted group counts — 0 = perfectly balanced corpus, →1 =
    one group dominates; the one-number balance check behind mixture
    tuning (q_source_lang_kl's sibling). Everything after the group-by
    runs on |groups| rows; the rank window is bounded by the dimension's
    cardinality, with a deterministic (count, key) tie-break."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    outs = []
    for dim in ("source", "lang"):
        counts = docs.groupBy(F.col(dim).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        ranked = counts.select(
            "c",
            F.row_number().over(Window.orderBy("c", "k")).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("cnt"),
        )
        gini = ranked.groupBy("cnt").agg(
            F.round(
                (2.0 * F.sum(F.col("rk") * F.col("c"))
                 - (F.col("cnt") + 1.0) * F.sum("c"))
                / (F.col("cnt") * F.sum("c")),
                6,
            ).alias("gini")
        )
        outs.append(gini.select(F.lit(dim).alias("dimension"), "gini"))
    return outs[0].unionByName(outs[1])
