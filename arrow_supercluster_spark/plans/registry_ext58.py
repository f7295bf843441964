"""Round-2 registry additions, batch 53 — ANN ablation harnesses:

- q_ivf_eval: recall@5 of the IVF path against brute force, per nprobe
  in {{1, 2, 4}} — the probe-budget tuning curve (rows-only: k-means
  list assignment is Spark-ML-seeded);
- q_quantization_ablation: top-5 retrieval overlap between f32 and
  dequantized-int8 embeddings — the accuracy cost of 4× compression,
  fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import similarity
from arrow_supercluster_spark.plans.registry_core import register

_EV_K = 5
_EV_NQ = 8


@register("q_ivf_eval", None)
def q_ivf_eval(spark, sf_dir):
    """ANN eval — the IVF probe-budget curve: recall@{k} vs brute force
    for nprobe ∈ {{1,2,4}} of 16 lists, over {nq} query vectors — the
    tuning table behind every IVF deployment (recall climbs with probes;
    the knee is the budget). Rows-only (list assignment is a seeded
    Spark-ML k-means); floors asserted in tests/test_batch53.py. The
    exact side reuses the two-phase cosine top-k.""".format(k=_EV_K, nq=_EV_NQ)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < _EV_NQ).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = similarity.cosine_topk(emb, queries, k=_EV_K).select(
        "q_id", F.col("vec_id").alias("nn")
    )
    n_exact = exact.count()
    rows = []
    for nprobe in (1, 2, 4):
        approx = similarity.ivf_topk(
            emb, queries, k=_EV_K, n_lists=16, nprobe=nprobe
        ).select("q_id", F.col("vec_id").alias("nn"))
        hit = approx.join(exact, ["q_id", "nn"], "leftsemi").count()
        rows.append((nprobe, n_exact, hit, round(hit / n_exact, 6)))
    return spark.createDataFrame(
        rows, "nprobe int, n_exact long, n_hit long, recall double"
    )


_QA_NQ = 8
_QA_K = 5

_SQL_DEQ = """
      SELECT vec_id,
             list_transform(embedding,
               x -> round(CAST(x AS DOUBLE) / s) * s) AS v
      FROM (
        SELECT vec_id, embedding,
               CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS s
        FROM (
          SELECT vec_id, embedding,
                 CAST(list_max(list_transform(embedding, x -> abs(x)))
                      AS DOUBLE) AS m
          FROM embeddings
        ) t
      ) u
"""


def _sql_topk(table: str) -> str:
    return f"""
      SELECT q_id, nn FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS nn,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY round(list_inner_product(a.v, b.v)
                   / (sqrt(list_inner_product(a.v, a.v))
                      * sqrt(list_inner_product(b.v, b.v))), 6) DESC,
                 b.vec_id
               ) AS rk
        FROM {table} a JOIN {table} b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < {_QA_NQ}
      ) WHERE rk <= {_QA_K}
"""


@register(
    "q_quantization_ablation",
    f"""
    WITH f32 AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    deq AS ({_SQL_DEQ}),
    exact_k AS ({_sql_topk("f32")}),
    quant_k AS ({_sql_topk("deq")})
    SELECT e.q_id,
           COUNT(*) AS k,
           SUM(CASE WHEN q.nn IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap,
           round(SUM(CASE WHEN q.nn IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS overlap_at_k
    FROM exact_k e
    LEFT JOIN quant_k q ON q.q_id = e.q_id AND q.nn = e.nn
    GROUP BY e.q_id
    """,
)
def q_quantization_ablation(spark, sf_dir):
    """ANN ablation — what int8 quantization costs retrieval: top-{k}
    overlap between f32 and DEQUANTIZED (round(x/s)·s) embeddings per
    query — the accuracy side of q_embedding_quantize's 4× compression,
    fully oracle-checked (the dequantized vectors are exact doubles on
    both engines). The kernel is the q_knn_accuracy all-pairs CHECK
    shape; production candidates come from the bucketed paths.""".format(
        k=_QA_K
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    f32 = emb.select("vec_id", similarity.as_double(F.col("embedding")).alias("v"))
    m = F.array_max(F.transform("embedding", lambda x: F.abs(x))).cast("double")
    s = F.when(m == 0, F.lit(1.0)).otherwise(m / 127.0)
    # the per-vector scale must be a bound column for the lambda
    deq = (
        emb.select("vec_id", "embedding", s.alias("s"))
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> round(CAST(x AS DOUBLE) / s) * s)"
            ).alias("v"),
        )
    )

    def topk(tbl):
        a = tbl.select(F.col("vec_id").alias("q_id"), F.col("v").alias("av")).filter(
            F.col("q_id") < _QA_NQ
        )
        b = tbl.select(F.col("vec_id").alias("nn"), F.col("v").alias("bv"))
        scored = a.join(b, F.col("q_id") != F.col("nn")).select(
            "q_id", "nn",
            F.round(similarity.cosine(F.col("av"), F.col("bv")), 6).alias("cos"),
        )
        w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "nn")
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _QA_K)
            .select("q_id", "nn")
        )

    exact_k = topk(f32)
    quant_k = topk(deq).withColumnRenamed("nn", "qnn")
    joined = exact_k.join(
        quant_k,
        (exact_k.q_id == quant_k.q_id) & (exact_k.nn == quant_k.qnn),
        "left",
    ).select(exact_k.q_id.alias("q_id"), "nn", "qnn")
    return joined.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("qnn").isNotNull().cast("int")).alias("n_overlap"),
        F.round(
            F.sum(F.col("qnn").isNotNull().cast("int")) * 1.0 / F.count(F.lit(1)),
            6,
        ).alias("overlap_at_k"),
    )
