"""Round-7 registry additions, batch 201 — clustering-structure
evaluation on the embedding table:

- q_hopkins: the Hopkins clusterability statistic (simplified d=1
  form, stated): m=64 deterministic uniform probes in the data's
  per-dimension bounding box vs the 64 smallest-id data points;
  H = Σu/(Σu+Σw) with u/w the Euclidean nearest-data distances —
  H ≈ 0.5 means spatially random, → 1 means clustered.
- q_dunn_index: min inter-label / max intra-label pairwise Euclidean
  distance over the `label` partition — squared distances fold as
  EXACT integers (coordinates pre-scaled ×1e6), so the min/max cuts
  are engine-stable without any rounding hazard.
- q_loocv_1nn: leave-one-out 1-NN classification of `label` using the
  exact round-6-cosine neighbor (the R596-R598 kNN construction) —
  per-label accuracy, the classic "are labels geometrically
  separable" baseline.

At 100 TB: Hopkins is two m×n probe joins (m literal); the Dunn and
LOOCV pair stages are the eval-only exact kernels (q_silhouette
class) with LSH/IVF as the production path; every distance is exact
integer arithmetic or round-6 cosine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb
from arrow_supercluster_spark.plans.registry_ext205 import (
    _SQL_KNN_COS,
    _spark_knn_cos,
)

_P = 2147483647
_HOP_M = 64
_EMB_D = 64
_SCALE = 1e6

_SQL_EINT = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
    f" * {_SCALE} + 0.5) AS BIGINT))"
)


def _eint_col():
    return F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * _SCALE + 0.5).cast("long"),
    )


def _sql_d2(a: str, b: str) -> str:
    # ||a−b||² = a·a − 2a·b + b·b: exact (integer-valued < 2^53)
    return (
        f"CAST(list_inner_product({a}, {a})"
        f" - 2 * list_inner_product({a}, {b})"
        f" + list_inner_product({b}, {b}) AS BIGINT)"
    )


def _d2_col(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


# ===========================================================================
# R599 — Hopkins clusterability statistic
# ===========================================================================

@register(
    "q_hopkins",
    f"""
    WITH e AS (SELECT vec_id, {_SQL_EINT} AS v FROM embeddings),
    bbox AS (
      SELECT a,
             MIN(v[a]) AS lo, MAX(v[a]) AS hi
      FROM (SELECT v, unnest(generate_series(1, {_EMB_D})) AS a FROM e)
      GROUP BY 1
    ),
    probes AS (
      SELECT j,
             list(CAST(floor(lo + ((2654435761 * (j * {_EMB_D} + a)
                                    + 12345) % {_P})
                              * 1.0 / {_P} * (hi - lo) + 0.5)
                       AS BIGINT) ORDER BY a) AS pv
      FROM (SELECT unnest(generate_series(0, {_HOP_M - 1})) AS j)
      CROSS JOIN bbox
      GROUP BY 1
    ),
    u AS (
      SELECT p.j, MIN({_sql_d2('p.pv', 'e.v')}) AS d2
      FROM probes p CROSS JOIN e GROUP BY 1
    ),
    wsample AS (
      SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_HOP_M}
    ),
    w AS (
      SELECT s.vec_id, MIN({_sql_d2('s.v', 'e.v')}) AS d2
      FROM wsample s JOIN e ON e.vec_id <> s.vec_id
      GROUP BY 1
    ),
    sums AS (
      SELECT (SELECT CAST(SUM(CAST(floor(sqrt(d2) + 0.5) AS BIGINT))
                     AS BIGINT) FROM u) AS su,
             (SELECT CAST(SUM(CAST(floor(sqrt(d2) + 0.5) AS BIGINT))
                     AS BIGINT) FROM w) AS sw
    )
    SELECT {_HOP_M} AS m,
           round(su * 1.0 / (su + sw), 6) AS hopkins
    FROM sums
    """,
)
def q_hopkins(spark, sf_dir):
    """R599 — H = Σu/(Σu+Σw): u = probe→data NN distance (64 affine-
    hash uniform probes in the integer-scaled bounding box), w =
    sampled-data→other-data NN distance (the 64 smallest ids,
    stated).  Squared distances are exact integers; the NN mins are
    exact; distances enter the sums as floor(√d²+0.5) integers so the
    final ratio is a ratio of exact integer sums."""
    e = _emb(spark, sf_dir).select("vec_id", _eint_col().alias("v"))
    bbox = (
        e.select(
            "v",
            F.explode(F.sequence(F.lit(1), F.lit(_EMB_D))).alias("a"),
        )
        .groupBy("a")
        .agg(
            F.min(F.element_at("v", F.col("a"))).alias("lo"),
            F.max(F.element_at("v", F.col("a"))).alias("hi"),
        )
    )
    jgrid = spark.range(_HOP_M).select(F.col("id").alias("j"))
    coord = F.floor(
        F.col("lo")
        + F.pmod(
            2654435761 * (F.col("j") * _EMB_D + F.col("a")) + 12345,
            F.lit(_P),
        )
        * 1.0
        / _P
        * (F.col("hi") - F.col("lo"))
        + 0.5
    ).cast("long")
    probes = (
        F.broadcast(jgrid)
        .crossJoin(F.broadcast(bbox))
        .select("j", "a", coord.alias("c"))
        .groupBy("j")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("a", "c"))
                ),
                lambda s: s.c,
            ).alias("pv")
        )
    )
    u = (
        e.select("v")
        .crossJoin(F.broadcast(probes))
        .groupBy("j")
        .agg(F.min(_d2_col(F.col("pv"), F.col("v"))).alias("d2"))
    )
    wsample = e.orderBy("vec_id").limit(_HOP_M)
    ws = wsample.select(
        F.col("vec_id").alias("sid"), F.col("v").alias("sv")
    )
    w = (
        e.join(F.broadcast(ws), F.col("vec_id") != F.col("sid"))
        .groupBy("sid")
        .agg(F.min(_d2_col(F.col("sv"), F.col("v"))).alias("d2"))
    )
    dint = F.floor(F.sqrt(F.col("d2")) + 0.5).cast("long")
    su = u.agg(F.sum(dint).alias("su"))
    sw = w.agg(F.sum(dint).alias("sw"))
    return su.crossJoin(F.broadcast(sw)).select(
        F.lit(_HOP_M).alias("m"),
        F.round(
            F.col("su") * 1.0 / (F.col("su") + F.col("sw")), 6
        ).alias("hopkins"),
    )


# ===========================================================================
# R600 — Dunn index over the label partition
# ===========================================================================

@register(
    "q_dunn_index",
    f"""
    WITH e AS (
      SELECT vec_id, label, {_SQL_EINT} AS v FROM embeddings
    ),
    pairs AS (
      SELECT a.label = b.label AS intra,
             {_sql_d2('a.v', 'b.v')} AS d2
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    ),
    agg AS (
      SELECT MIN(CASE WHEN NOT intra THEN d2 END) AS min_inter2,
             MAX(CASE WHEN intra THEN d2 END) AS max_intra2
      FROM pairs
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n,
           (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) FROM e)
             AS n_labels,
           round(sqrt(min_inter2) / {_SCALE}, 6) AS min_inter,
           round(sqrt(max_intra2) / {_SCALE}, 6) AS max_intra,
           round(sqrt(min_inter2) / sqrt(max_intra2), 6) AS dunn
    FROM agg
    """,
)
def q_dunn_index(spark, sf_dir):
    """R600 — Dunn = min inter-label distance / max intra-label
    diameter, single-linkage form: squared Euclidean distances fold
    as exact integers over the pair join, so the min/max cuts are
    exact; only the final square roots are floating.  Eval-only
    exact pair stage (the q_silhouette class)."""
    e = _emb(spark, sf_dir).select(
        "vec_id", "label", _eint_col().alias("v")
    )

    # r11 (VERDICT r10 #8, guide §4.2): the BNLJ + interpreted HOF fold
    # over n²/2 pairs becomes a block-pair NumPy kernel — distances are
    # exact int64 (a·a − 2a·b + b·b over the micro-grid integers, the
    # same identity the SQL twin uses), so the min/max cuts are
    # bit-identical to the fold form (verified exceptAll = 0 at all
    # three SFs).  Each block pair emits one (min_inter2, max_intra2)
    # partial row; the driver-side agg below combines them exactly.
    import numpy as np
    import pandas as pd

    from arrow_supercluster_spark.functions import blockpairs as bp

    def _dunn_fn(pdf):
        pa, pb = int(pdf["pa"].iat[0]), int(pdf["pb"].iat[0])
        a = pdf[pdf["p"] == pa]
        b_ = pdf[pdf["p"] == pb]
        if a.empty or b_.empty:
            return pd.DataFrame({"min_inter2": [], "max_intra2": []})
        A = np.stack(a["v"].to_numpy()).astype(np.int64)
        B = np.stack(b_["v"].to_numpy()).astype(np.int64)
        d2 = bp.d2_int(A, B)
        mask = bp.pair_mask(
            a["vec_id"].to_numpy(), b_["vec_id"].to_numpy(), pa == pb
        )
        la = a["label"].to_numpy()
        lb = b_["label"].to_numpy()
        intra = (la[:, None] == lb[None, :]) & mask
        inter = (la[:, None] != lb[None, :]) & mask
        return pd.DataFrame(
            [
                {
                    "min_inter2": int(d2[inter].min()) if inter.any() else None,
                    "max_intra2": int(d2[intra].max()) if intra.any() else None,
                }
            ]
        )

    partials = bp.block_pair_groups(
        e, _dunn_fn, "min_inter2 long, max_intra2 long"
    )
    agg = partials.agg(
        F.min("min_inter2").alias("min_inter2"),
        F.max("max_intra2").alias("max_intra2"),
    )
    stats = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("label").alias("n_labels"),
    )
    return agg.crossJoin(F.broadcast(stats)).select(
        "n",
        "n_labels",
        F.round(F.sqrt(F.col("min_inter2")) / _SCALE, 6).alias(
            "min_inter"
        ),
        F.round(F.sqrt(F.col("max_intra2")) / _SCALE, 6).alias(
            "max_intra"
        ),
        F.round(
            F.sqrt(F.col("min_inter2")) / F.sqrt(F.col("max_intra2")), 6
        ).alias("dunn"),
    )


# ===========================================================================
# R601 — leave-one-out 1-NN label accuracy
# ===========================================================================

@register(
    "q_loocv_1nn",
    f"""
    WITH {_SQL_KNN_COS},
    lab AS (SELECT vec_id, label FROM embeddings),
    nn1 AS (
      SELECT k.src, k.dst FROM knn k WHERE k.rk = 1
    ),
    hits_ AS (
      SELECT ls.label AS true_label,
             CASE WHEN ls.label = ld.label THEN 1 ELSE 0 END AS hit
      FROM nn1
      JOIN lab ls ON ls.vec_id = nn1.src
      JOIN lab ld ON ld.vec_id = nn1.dst
    )
    SELECT true_label AS label, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(hit) AS BIGINT) AS correct,
           round(SUM(hit) * 1.0 / COUNT(*), 6) AS accuracy
    FROM hits_ GROUP BY 1 ORDER BY 1
    """,
)
def q_loocv_1nn(spark, sf_dir):
    """R601 — per-label leave-one-out 1-NN accuracy on the exact
    round-6-cosine neighbor (self excluded by the kNN construction):
    the geometric label-separability baseline every embedding eval
    starts from."""
    knn = _spark_knn_cos(spark, sf_dir)
    lab = _emb(spark, sf_dir).select("vec_id", "label")
    nn1 = knn.filter(F.col("rk") == 1).select("src", "dst")
    ls = lab.select(
        F.col("vec_id").alias("sid"), F.col("label").alias("true_label")
    )
    ld = lab.select(
        F.col("vec_id").alias("did"), F.col("label").alias("nn_label")
    )
    # plain equi-joins: the id->label map is corpus-sized, never
    # broadcast; AQE picks the strategy at the actual scale
    scored = (
        nn1.join(ls, F.col("sid") == F.col("src"))
        .join(ld, F.col("did") == F.col("dst"))
        .select(
            "true_label",
            F.when(
                F.col("true_label") == F.col("nn_label"), 1
            )
            .otherwise(0)
            .alias("hit"),
        )
    )
    return (
        scored.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("hit").alias("correct"),
        )
        .select(
            "label",
            "n",
            "correct",
            F.round(
                F.col("correct") * 1.0 / F.col("n"), 6
            ).alias("accuracy"),
        )
        .orderBy("label")
    )
