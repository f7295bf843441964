"""Round-8 registry additions, batch 211 — retrieval-eval completion
(the three standard rank metrics missing beside MAP@k / q_map_at_k):

- q_mrr: mean reciprocal rank @k — 1/rank of the FIRST relevant hit
  (0 when none lands in the top k); the metric QA-style retrieval
  reads first.
- q_ndcg_at_k: binary-relevance NDCG@k — DCG = Σ rel/log₂(rk+1),
  ideal DCG from min(total relevant in corpus, k) (the standard
  convention, stated); label-mass imbalance shows up here before it
  shows in MAP.
- q_precision_recall_at_k: mean precision@k, mean recall@k (hits@k
  over total relevant in corpus) and hit rate (frac of queries with
  ≥1 hit in k) — the coverage counterpart of the rank-position pair.

All three share q_map_at_k's construction exactly: every vector
queries the corpus, neighbors rank by (round-6 cosine DESC, id),
relevance = same label.  At 100 TB the all-pairs frame is the
documented EVAL-ONLY kernel (BLAS top-k per Arrow batch since r7;
LSH/IVF is the production path); the metric algebra above the top-k
edges is per-query k-row windows + one global mean.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb
from arrow_supercluster_spark.plans.registry_ext162 import _MAP_K, _SQL_COS

_SQL_RANKED = f"""
    scored AS (
      SELECT a.vec_id AS q, a.label AS ql, b.label AS nl,
             round({_SQL_COS}, 6) AS cos, b.vec_id AS nid
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT q, ql, nl,
             ROW_NUMBER() OVER (PARTITION BY q
                                ORDER BY cos DESC, nid) AS rk
      FROM scored
    ),
    topk AS (
      SELECT q, rk, CASE WHEN ql = nl THEN 1 ELSE 0 END AS rel
      FROM ranked WHERE rk <= {_MAP_K}
    ),
    relcount AS (
      SELECT a.vec_id AS q, CAST(COUNT(*) AS BIGINT) AS n_rel
      FROM embeddings a JOIN embeddings b
        ON a.vec_id <> b.vec_id AND a.label = b.label
      GROUP BY a.vec_id
    )"""


def _spark_topk(spark, sf_dir):
    """The shared q_map_at_k top-k frame: (q, rk, rel) for rk ≤ k, plus
    the per-query corpus relevant-count — BLAS kernel + (cos DESC, id)
    re-rank, identical to registry_ext162's construction."""
    from arrow_supercluster_spark.operators.similarity import (
        cosine_topk_gemm,
    )

    emb = _emb(spark, sf_dir)
    labels = emb.select("vec_id", "label")
    topk1 = cosine_topk_gemm(
        corpus=emb,
        queries=emb.select(F.col("vec_id").alias("q_id"), "embedding"),
        k=_MAP_K + 1,
    ).filter(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    topk = (
        topk1.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MAP_K)
        .join(
            labels.select(
                F.col("vec_id").alias("q_id"), F.col("label").alias("ql")
            ),
            "q_id",
        )
        .join(labels.select("vec_id", F.col("label").alias("nl")), "vec_id")
        .select(
            F.col("q_id").alias("q"),
            "rk",
            F.when(F.col("ql") == F.col("nl"), 1).otherwise(0).alias("rel"),
        )
    )
    lc = labels.groupBy("label").agg(F.count(F.lit(1)).alias("lc"))
    relcount = labels.join(F.broadcast(lc), "label").select(
        F.col("vec_id").alias("q"), (F.col("lc") - 1).alias("n_rel")
    )
    return topk, relcount


@register(
    "q_mrr",
    f"""
    WITH {_SQL_RANKED},
    firsthit AS (
      SELECT q, MIN(rk) AS first_rel FROM topk WHERE rel = 1 GROUP BY q
    ),
    allq AS (SELECT DISTINCT q FROM topk)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(AVG(CASE WHEN f.first_rel IS NULL THEN 0.0
                     ELSE 1.0 / f.first_rel END), 6) AS mrr_at_k,
           round(SUM(CASE WHEN f.first_rel = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS frac_top1
    FROM allq LEFT JOIN firsthit f ON f.q = allq.q
    """,
)
def q_mrr(spark, sf_dir):
    """R626 — MRR@{k}: mean over queries of 1/rank of the first
    same-label neighbor (0 when no hit lands in the top {k}); frac_top1
    = share of queries whose nearest neighbor is already relevant.
    Shares q_map_at_k's ranked frame verbatim.""".format(k=_MAP_K)
    topk, _ = _spark_topk(spark, sf_dir)
    firsthit = (
        topk.filter(F.col("rel") == 1)
        .groupBy("q")
        .agg(F.min("rk").alias("first_rel"))
    )
    allq = topk.select("q").distinct()
    j = allq.join(firsthit, "q", "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(
            F.avg(
                F.when(F.col("first_rel").isNull(), 0.0).otherwise(
                    1.0 / F.col("first_rel")
                )
            ),
            6,
        ).alias("mrr_at_k"),
        F.round(
            F.sum(F.when(F.col("first_rel") == 1, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("frac_top1"),
    )


@register(
    "q_ndcg_at_k",
    f"""
    WITH {_SQL_RANKED},
    dcg AS (
      SELECT q, SUM(rel / (ln(rk + 1.0) / ln(2.0))) AS dcg
      FROM topk GROUP BY q
    ),
    idcg AS (
      SELECT q,
             (SELECT COALESCE(SUM(1.0 / (ln(i + 1.0) / ln(2.0))), 0.0)
              FROM UNNEST(range(1, LEAST(relcount.n_rel, {_MAP_K}) + 1))
                AS t(i)) AS idcg
      FROM relcount
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(AVG(CASE WHEN idcg.idcg > 0
                     THEN dcg.dcg / idcg.idcg ELSE 0.0 END), 6)
             AS ndcg_at_k
    FROM dcg JOIN idcg ON idcg.q = dcg.q
    """,
)
def q_ndcg_at_k(spark, sf_dir):
    """R627 — binary NDCG@{k}: DCG = Σ rel/log₂(rk+1) over the top {k},
    normalized by the ideal DCG of min(corpus relevant count, {k}) hits
    (the standard cut-off convention, stated — a query whose label has
    fewer than {k} peers is not penalized for physics).  log₂ is
    mirrored as ln/ln(2) in both engines.""".format(k=_MAP_K)
    topk, relcount = _spark_topk(spark, sf_dir)
    dcg = topk.groupBy("q").agg(
        F.sum(
            F.col("rel") / (F.log(F.col("rk") + 1.0) / F.log(F.lit(2.0)))
        ).alias("dcg")
    )
    ideal = relcount.select(
        "q",
        F.expr(
            f"coalesce(aggregate(sequence(1, int(least(n_rel, {_MAP_K}))), "
            f"cast(0.0 as double), "
            f"(acc, i) -> acc + 1.0 / (ln(i + 1.0) / ln(2.0))), 0.0)"
        ).alias("idcg"),
    )
    j = dcg.join(ideal, "q")
    return j.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(
            F.avg(
                F.when(
                    F.col("idcg") > 0, F.col("dcg") / F.col("idcg")
                ).otherwise(0.0)
            ),
            6,
        ).alias("ndcg_at_k"),
    )


@register(
    "q_precision_recall_at_k",
    f"""
    WITH {_SQL_RANKED},
    perq AS (
      SELECT q, SUM(rel) AS hits, CAST(COUNT(*) AS BIGINT) AS k
      FROM topk GROUP BY q
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(AVG(perq.hits * 1.0 / perq.k), 6) AS precision_at_k,
           round(AVG(CASE WHEN relcount.n_rel > 0
                     THEN perq.hits * 1.0 / LEAST(relcount.n_rel, {_MAP_K})
                     ELSE 0.0 END), 6) AS recall_at_k,
           round(AVG(CASE WHEN perq.hits > 0 THEN 1.0 ELSE 0.0 END), 6)
             AS hit_rate
    FROM perq JOIN relcount ON relcount.q = perq.q
    """,
)
def q_precision_recall_at_k(spark, sf_dir):
    """R628 — precision@{k} (hits/k retrieved), recall@{k} (hits over
    min(corpus relevant, {k}) — the attainable-recall convention,
    matching R627's ideal), and hit rate (≥1 hit in {k}).  The coverage
    counterpart of MRR/NDCG's rank-position view; same ranked frame,
    one per-query agg + one global mean.""".format(k=_MAP_K)
    topk, relcount = _spark_topk(spark, sf_dir)
    perq = topk.groupBy("q").agg(
        F.sum("rel").alias("hits"), F.count(F.lit(1)).alias("k")
    )
    j = perq.join(relcount, "q")
    return j.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg(F.col("hits") * 1.0 / F.col("k")), 6).alias(
            "precision_at_k"
        ),
        F.round(
            F.avg(
                F.when(
                    F.col("n_rel") > 0,
                    F.col("hits")
                    * 1.0
                    / F.least(F.col("n_rel"), F.lit(_MAP_K)),
                ).otherwise(0.0)
            ),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.avg(F.when(F.col("hits") > 0, 1.0).otherwise(0.0)), 6
        ).alias("hit_rate"),
    )
