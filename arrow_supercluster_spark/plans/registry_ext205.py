"""Round-7 registry additions, batch 200 — embedding-geometry
diagnostics II (the high-dimensional pathology screens):

- q_hubness: skewness of the k-NN in-degree distribution (Radovanović
  et al. 2010) — hubs (huge in-degree) and antihubs (zero) are THE
  symptom of concentration in high dimensions and silently bias every
  kNN-based dedup/retrieval decision.  In-degree moments fold exact
  integers.
- q_twonn_dim: the TwoNN intrinsic-dimension estimator (Facco et al.
  2017): ID = n / Σ ln(d₂/d₁) over points (duplicate-distance points
  with d₁ = 0 excluded, counted) — tells you the data manifold is
  ~10-dimensional even when the ambient space is 64.
- q_lid: Levina-Bickel local intrinsic dimensionality at k=5,
  LID(x) = −(1/k Σᵢ ln(dᵢ/d_k))⁻¹, aggregated (mean/min/max) — the
  per-point difficulty score used for hardness-aware sampling.

All three consume the SAME exact k-NN construction the graph family
uses (operators/similarity.knn_edges_exact discipline: BLAS GEMM
scoring rounded to 6, (cos DESC, id) ranking) with distances
d = 1 − cos.  At 100 TB the exact kernel is eval-only by contract —
the production substitution is knn_edges_lsh — and everything after
the edge build is per-source k-row algebra plus integer moment folds.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb

_HG_K = 5

_SQL_KNN_COS = f"""
    e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_inner_product(a.v, b.v)
                   / (sqrt(list_inner_product(a.v, a.v))
                      * sqrt(list_inner_product(b.v, b.v))), 6) AS cos
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT src, dst, cos, rk FROM (
        SELECT src, dst, cos, ROW_NUMBER() OVER (
          PARTITION BY src ORDER BY cos DESC, dst) AS rk
        FROM scored
      ) WHERE rk <= {_HG_K}
    )
"""


def _spark_knn_cos(spark, sf_dir):
    """(src, dst, cos, rk) for rk <= k — the knn_edges_exact
    construction, keeping the round-6 GEMM cosine."""
    from arrow_supercluster_spark.operators.similarity import (
        cosine_topk_gemm,
    )

    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    topk1 = cosine_topk_gemm(
        corpus=e.select("vec_id", F.col("v").alias("_emb")),
        queries=e.select(
            F.col("vec_id").alias("_q"), F.col("v").alias("_emb")
        ),
        k=_HG_K + 1,
        vec="_emb",
        key="vec_id",
        qkey="_q",
    ).filter(F.col("vec_id") != F.col("_q"))
    w = Window.partitionBy("_q").orderBy(F.col("cos").desc(), "vec_id")
    return (
        topk1.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HG_K)
        .select(
            F.col("_q").alias("src"),
            F.col("vec_id").alias("dst"),
            "cos",
            "rk",
        )
    )


# ===========================================================================
# R596 — k-NN in-degree hubness
# ===========================================================================

@register(
    "q_hubness",
    f"""
    WITH {_SQL_KNN_COS},
    indeg AS (
      SELECT e.vec_id, COALESCE(d.cnt, 0) AS deg
      FROM e LEFT JOIN (
        SELECT dst, CAST(COUNT(*) AS BIGINT) AS cnt FROM knn GROUP BY 1
      ) d ON d.dst = e.vec_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(deg) AS BIGINT) AS s1,
             CAST(SUM(deg * deg) AS BIGINT) AS s2,
             CAST(SUM(deg * deg * deg) AS BIGINT) AS s3,
             CAST(MAX(deg) AS BIGINT) AS mx,
             CAST(SUM(CASE WHEN deg = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS z
      FROM indeg
    )
    SELECT n, {_HG_K} AS k,
           round((CAST(s3 AS DOUBLE) / n
                  - 3.0 * (CAST(s1 AS DOUBLE) / n)
                    * (CAST(s2 AS DOUBLE) / n)
                  + 2.0 * power(CAST(s1 AS DOUBLE) / n, 3))
                 / power(CAST(s2 AS DOUBLE) / n
                         - power(CAST(s1 AS DOUBLE) / n, 2), 1.5), 6)
             AS indeg_skewness,
           mx AS max_indegree, z AS n_antihubs
    FROM mom
    """,
)
def q_hubness(spark, sf_dir):
    """R596 — population skewness g₁ = m₃/m₂^1.5 of the exact 5-NN
    in-degree distribution (zeros included via the left join), plus
    the max in-degree (the biggest hub) and the antihub count.
    Moments fold exact integers; mean in-degree is k by construction
    (asserted in tests)."""
    knn = _spark_knn_cos(spark, sf_dir)
    e = _emb(spark, sf_dir).select("vec_id")
    d = knn.groupBy("dst").agg(F.count(F.lit(1)).alias("cnt"))
    indeg = e.join(
        d, F.col("dst") == F.col("vec_id"), "left"
    ).select(F.coalesce(F.col("cnt"), F.lit(0)).alias("deg"))
    mom = indeg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("deg").alias("s1"),
        F.sum(F.col("deg") * F.col("deg")).alias("s2"),
        F.sum(F.col("deg") * F.col("deg") * F.col("deg")).alias("s3"),
        F.max("deg").alias("mx"),
        F.sum(F.when(F.col("deg") == 0, 1).otherwise(0)).alias("z"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2c = F.col("s2").cast("double") / F.col("n") - m1 * m1
    m3c = (
        F.col("s3").cast("double") / F.col("n")
        - 3.0 * m1 * (F.col("s2").cast("double") / F.col("n"))
        + 2.0 * F.pow(m1, F.lit(3.0))
    )
    return mom.select(
        "n",
        F.lit(_HG_K).alias("k"),
        F.round(m3c / F.pow(m2c, F.lit(1.5)), 6).alias(
            "indeg_skewness"
        ),
        F.col("mx").alias("max_indegree"),
        F.col("z").alias("n_antihubs"),
    )


# ===========================================================================
# R597 — TwoNN intrinsic dimension
# ===========================================================================

@register(
    "q_twonn_dim",
    f"""
    WITH {_SQL_KNN_COS},
    pairs AS (
      SELECT src,
             MAX(CASE WHEN rk = 1 THEN 1.0 - cos END) AS d1,
             MAX(CASE WHEN rk = 2 THEN 1.0 - cos END) AS d2
      FROM knn WHERE rk <= 2 GROUP BY 1
    ),
    used AS (SELECT src, ln(d2 / d1) AS lm FROM pairs WHERE d1 > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs)
             - CAST(COUNT(*) AS BIGINT) AS n_excluded,
           round(COUNT(*) / SUM(lm), 4) AS id_hat
    FROM used
    """,
)
def q_twonn_dim(spark, sf_dir):
    """R597 — TwoNN: ID = n/Σ ln(d₂/d₁) with d = 1 − round-6 cosine
    (first/second neighbor under the deterministic kNN rank);
    points with d₁ = 0 (near-duplicates at 6-decimal resolution) are
    excluded and counted."""
    knn = _spark_knn_cos(spark, sf_dir)
    pairs = (
        knn.filter(F.col("rk") <= 2)
        .groupBy("src")
        .agg(
            F.max(
                F.when(F.col("rk") == 1, 1.0 - F.col("cos"))
            ).alias("d1"),
            F.max(
                F.when(F.col("rk") == 2, 1.0 - F.col("cos"))
            ).alias("d2"),
        )
    )
    n_all = pairs.agg(F.count(F.lit(1)).alias("n_all"))
    used = pairs.filter(F.col("d1") > 0).select(
        F.log(F.col("d2") / F.col("d1")).alias("lm")
    )
    agg = used.agg(
        F.count(F.lit(1)).alias("n_used"), F.sum("lm").alias("s")
    )
    return agg.crossJoin(F.broadcast(n_all)).select(
        "n_used",
        (F.col("n_all") - F.col("n_used")).alias("n_excluded"),
        F.round(F.col("n_used") / F.col("s"), 4).alias("id_hat"),
    )


# ===========================================================================
# R598 — Levina-Bickel local intrinsic dimensionality
# ===========================================================================

@register(
    "q_lid",
    f"""
    WITH {_SQL_KNN_COS},
    kth AS (
      SELECT src, MAX(CASE WHEN rk = {_HG_K} THEN 1.0 - cos END) AS dk
      FROM knn GROUP BY 1
    ),
    pts AS (
      SELECT knn.src,
             SUM(ln((1.0 - knn.cos) / kth.dk)) AS s,
             MIN(1.0 - knn.cos) AS dmin
      FROM knn JOIN kth ON kth.src = knn.src
      GROUP BY knn.src
    ),
    used AS (
      SELECT src, -{_HG_K}.0 / s AS lid FROM pts
      WHERE dmin > 0 AND s < 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pts)
             - CAST(COUNT(*) AS BIGINT) AS n_excluded,
           round(AVG(lid), 4) AS mean_lid,
           round(MIN(lid), 4) AS min_lid,
           round(MAX(lid), 4) AS max_lid
    FROM used
    """,
)
def q_lid(spark, sf_dir):
    """R598 — LID(x) = −(1/k Σᵢ ln(dᵢ/d_k))⁻¹ at k=5 per point
    (points with a zero distance or an all-equal neighborhood
    excluded, counted), aggregated to mean/min/max — the per-point
    hardness signal behind difficulty-aware sampling."""
    knn = _spark_knn_cos(spark, sf_dir)
    kth = knn.groupBy(F.col("src").alias("ks")).agg(
        F.max(
            F.when(F.col("rk") == _HG_K, 1.0 - F.col("cos"))
        ).alias("dk")
    )
    pts = (
        knn.join(kth, F.col("ks") == F.col("src"))
        .groupBy("src")
        .agg(
            F.sum(F.log((1.0 - F.col("cos")) / F.col("dk"))).alias("s"),
            F.min(1.0 - F.col("cos")).alias("dmin"),
        )
    )
    n_all = pts.agg(F.count(F.lit(1)).alias("n_all"))
    used = pts.filter((F.col("dmin") > 0) & (F.col("s") < 0)).select(
        (-float(_HG_K) / F.col("s")).alias("lid")
    )
    agg = used.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.avg("lid").alias("mean_lid"),
        F.min("lid").alias("min_lid"),
        F.max("lid").alias("max_lid"),
    )
    return agg.crossJoin(F.broadcast(n_all)).select(
        "n_used",
        (F.col("n_all") - F.col("n_used")).alias("n_excluded"),
        F.round("mean_lid", 4).alias("mean_lid"),
        F.round("min_lid", 4).alias("min_lid"),
        F.round("max_lid", 4).alias("max_lid"),
    )
