"""Round-4 registry additions, batch 85 — the hardest TPC-H
decorrelation shape, CUPED experimentation, and ranking evaluation:

- q_late_supplier: TPC-H Q21's structure (the benchmark's hardest
  subquery nest: EXISTS + NOT EXISTS both correlated to the outer row)
  adapted to this schema — suppliers who were the SOLE late shipper on
  multi-supplier orders ("late" = shipped > 90 days after the order
  date; the driver's lineitem has no receipt/commit dates). The oracle
  keeps the correlated form verbatim; the Spark plan is the manual
  decorrelation: per-order supplier/late-supplier distinct counts
  replace both subqueries with one grouped frame.
- q_cuped: CUPED variance reduction (Deng et al. 2013) for the A/B
  surface: pre-period activity as the covariate, θ = cov(pre, post) /
  var(pre) from pooled moments, adjusted = post - θ·(pre - mean(pre)).
  Reports per-arm means and variances of both raw and adjusted metrics
  — the variance drop is the whole point.
- q_ndcg: NDCG@10 for the exact-cosine retrieval (queries = vec_id<10,
  relevant = same label): DCG over the rounded-cos ranking (the
  established stable cross-engine order), IDCG closed-form for binary
  relevance, per-query ndcg. Completes the eval set (AUC / PR curve /
  lift) with the ranking-quality metric.

At 100 TB: Q21's decorrelation is two order-keyed aggs + one broadcast
dim join (the correlated form would be two per-row subquery scans);
CUPED is two user-keyed collapses + a 1-row moment frame; NDCG scoring
rides the same broadcast-queries kernel as q_cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb
from arrow_supercluster_spark.sources.tables import read_events

_LATE_DAYS = 90


@register(
    "q_late_supplier",
    f"""
    WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
    late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
      GROUP BY 1, 2
    )
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    WHERE EXISTS (SELECT 1 FROM l l2
                  WHERE l2.l_orderkey = w.l_orderkey
                    AND l2.l_suppkey <> w.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late w2
                      WHERE w2.l_orderkey = w.l_orderkey
                        AND w2.l_suppkey <> w.l_suppkey)
    GROUP BY 1, 2
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape — sole-late-supplier count on multi-supplier
    orders. Decorrelation: EXISTS(other supplier) ⇔ the order's distinct
    supplier count > 1; NOT EXISTS(other LATE supplier) ⇔ the order's
    distinct LATE-supplier count = 1 (the candidate being one of them).
    Two order-keyed aggregates replace both correlated probes; supplier
    is a broadcast dim; the (numwait DESC, s_name) order is total, so
    LIMIT 20 is deterministic cross-engine."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    n_supps = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps")
    )
    n_late = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_late")
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    return (
        late.join(n_supps, "l_orderkey")
        .join(n_late, "l_orderkey")
        .filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q_cuped",
    """
    WITH bounds AS (
      SELECT epoch_us(MIN(ts)) + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2
               AS mid
      FROM events
    ),
    per_user AS (
      SELECT user_id, user_id % 2 AS grp,
             SUM(CASE WHEN epoch_us(ts) < (SELECT mid FROM bounds)
                      THEN value ELSE 0 END) AS pre,
             SUM(CASE WHEN epoch_us(ts) >= (SELECT mid FROM bounds)
                      THEN value ELSE 0 END) AS post
      FROM events GROUP BY 1, 2
    ),
    mom AS (
      SELECT AVG(pre) AS mx, AVG(post) AS my,
             AVG(pre * post) AS mxy, AVG(pre * pre) AS mxx
      FROM per_user
    ),
    theta AS (
      SELECT mx, (mxy - mx * my) / (mxx - mx * mx) AS th FROM mom
    ),
    adj AS (
      SELECT u.grp, u.post,
             u.post - t.th * (u.pre - t.mx) AS post_adj
      FROM per_user u CROSS JOIN theta t
    )
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(post), 4) AS mean_post,
           ROUND(AVG(post_adj), 4) AS mean_adj,
           ROUND(AVG(post * post) - AVG(post) * AVG(post), 2) AS var_post,
           ROUND(AVG(post_adj * post_adj) - AVG(post_adj) * AVG(post_adj), 2)
             AS var_adj
    FROM adj GROUP BY grp
    """,
)
def q_cuped(spark, sf_dir):
    """Experimentation — CUPED variance reduction: θ fit on pooled
    pre/post user sums (moment form cov/var), arms = deterministic
    user-id parity (the q_ab_test convention). Adjusted means equal raw
    means up to sampling noise while var_adj < var_post — the
    sensitivity gain. Two user-keyed collapses + a broadcast 1-row θ
    frame; variance outputs rounded to 2 (they sit at ~1e4 magnitude —
    double partial-agg order noise lives at ~1e-6)."""
    ev = read_events(spark, sf_dir)
    b = ev.agg(
        F.min("ts").cast("long").alias("lo"), F.max("ts").cast("long").alias("hi")
    ).select(
        (F.col("lo") + F.floor((F.col("hi") - F.col("lo")) / 2)).alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id", (F.col("user_id") % 2).alias("grp"))
        .agg(
            F.sum(
                F.when(F.col("ts").cast("long") < F.col("mid"), F.col("value"))
                .otherwise(0.0)
            ).alias("pre"),
            F.sum(
                F.when(F.col("ts").cast("long") >= F.col("mid"), F.col("value"))
                .otherwise(0.0)
            ).alias("post"),
        )
    )
    mom = per_user.agg(
        F.avg("pre").alias("mx"),
        F.avg("post").alias("my"),
        F.avg(F.col("pre") * F.col("post")).alias("mxy"),
        F.avg(F.col("pre") * F.col("pre")).alias("mxx"),
    ).select(
        "mx",
        (
            (F.col("mxy") - F.col("mx") * F.col("my"))
            / (F.col("mxx") - F.col("mx") * F.col("mx"))
        ).alias("th"),
    )
    adj = per_user.crossJoin(F.broadcast(mom)).select(
        "grp",
        "post",
        (F.col("post") - F.col("th") * (F.col("pre") - F.col("mx"))).alias(
            "post_adj"
        ),
    )
    return adj.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("post"), 4).alias("mean_post"),
        F.round(F.avg("post_adj"), 4).alias("mean_adj"),
        F.round(
            F.avg(F.col("post") * F.col("post"))
            - F.avg("post") * F.avg("post"),
            2,
        ).alias("var_post"),
        F.round(
            F.avg(F.col("post_adj") * F.col("post_adj"))
            - F.avg("post_adj") * F.avg("post_adj"),
            2,
        ).alias("var_adj"),
    )


_NDCG_K = 10


@register(
    "q_ndcg",
    f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv, label AS ql
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, embedding::DOUBLE[] AS cv, label
          FROM embeddings WHERE vec_id >= 10),
    scored AS (
      SELECT q.q_id, q.ql, c.vec_id, c.label,
             round(CASE WHEN sqrt(list_inner_product(q.qv, q.qv))
                             * sqrt(list_inner_product(c.cv, c.cv)) = 0
                        THEN 0.0
                        ELSE list_inner_product(q.qv, c.cv)
                             / (sqrt(list_inner_product(q.qv, q.qv))
                                * sqrt(list_inner_product(c.cv, c.cv))) END,
                   6) AS cos
      FROM q, c
    ),
    ranked AS (
      SELECT q_id, ql, label,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id) AS rnk
      FROM scored
    ),
    nrel AS (
      SELECT q_id, CAST(SUM(CASE WHEN label = ql THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_rel
      FROM scored GROUP BY q_id
    ),
    dcg AS (
      SELECT q_id,
             SUM(CASE WHEN label = ql THEN 1.0 / log2(rnk + 1)
                      ELSE 0.0 END) AS dcg
      FROM ranked WHERE rnk <= {_NDCG_K} GROUP BY q_id
    ),
    idcg AS (
      SELECT q_id, SUM(1.0 / log2(i + 1)) AS idcg
      FROM nrel, unnest(generate_series(1, least(n_rel, {_NDCG_K}))) AS t(i)
      WHERE n_rel > 0
      GROUP BY q_id
    )
    SELECT n.q_id, n.n_rel,
           ROUND(coalesce(d.dcg, 0.0), 6) AS dcg,
           ROUND(coalesce(i.idcg, 0.0), 6) AS idcg,
           ROUND(CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg ELSE 0.0 END, 6)
             AS ndcg
    FROM nrel n
    LEFT JOIN dcg d ON d.q_id = n.q_id
    LEFT JOIN idcg i ON i.q_id = n.q_id
    """,
)
def q_ndcg(spark, sf_dir):
    """IR evaluation — NDCG@10 of the exact cosine retrieval with
    same-label binary relevance. Ranking = (round(cos, 6) DESC, vec_id)
    — the stable cross-engine order q_cosine_topk established. IDCG is
    the closed form Σ_{{i≤min(R,10)}} 1/log2(i+1) (binary relevance needs
    no ideal re-sort). The per-query window partitions on q_id — 10
    bounded keys."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id", F.col("embedding").alias("cv"), "label"
    )
    dd = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    nq = F.sqrt(dd(F.col("qv"), F.col("qv")))
    nc = F.sqrt(dd(F.col("cv"), F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .select(
            "q_id", "ql", "vec_id", "label",
            F.round(
                F.when(nq * nc == 0, F.lit(0.0)).otherwise(
                    dd(F.col("qv"), F.col("cv")) / (nq * nc)
                ),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "vec_id")
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    nrel = scored.groupBy("q_id", "ql").agg(
        F.sum(F.when(F.col("label") == F.col("ql"), 1).otherwise(0))
        .cast("long")
        .alias("n_rel")
    )
    dcg = (
        ranked.filter(F.col("rnk") <= _NDCG_K)
        .groupBy("q_id")
        .agg(
            F.sum(
                F.when(
                    F.col("label") == F.col("ql"),
                    F.lit(1.0) / F.log2(F.col("rnk") + 1),
                ).otherwise(0.0)
            ).alias("dcg")
        )
    )
    # closed-form IDCG; Spark's sequence(1, 0) DESCENDS instead of
    # returning empty, so the zero-relevant case is guarded explicitly
    idcg_expr = F.when(F.col("n_rel") > 0, F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(_NDCG_K))),
            lambda i: F.lit(1.0) / F.log2(i.cast("double") + 1),
        ),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )).otherwise(F.lit(0.0))
    return (
        nrel.join(dcg, "q_id", "left")
        .select(
            "q_id", "n_rel",
            F.round(F.coalesce("dcg", F.lit(0.0)), 6).alias("dcg"),
            F.round(idcg_expr, 6).alias("idcg"),
            F.round(
                F.when(
                    idcg_expr > 0,
                    F.coalesce("dcg", F.lit(0.0)) / idcg_expr,
                ).otherwise(0.0),
                6,
            ).alias("ndcg"),
        )
    )
