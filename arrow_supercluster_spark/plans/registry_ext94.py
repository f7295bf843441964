"""Round-4 registry additions, batch 89 — ranking agreement, diversified
reranking, and series alignment:

- q_rbo: rank-biased overlap (Webber et al. 2010) between the BM25 and
  normalized-TF rankings q_rrf_fusion fuses — the standard top-weighted
  ranking-agreement measure (Kendall/Spearman treat all depths equally;
  RBO discounts by p^depth). Truncated form at depth 10; the cumulative
  sum is a triangular grid self-join, not a window.
- q_mmr_rerank: Maximal Marginal Relevance (Carbonell & Goldstein 1998)
  diversified reranking of the exact-cosine top-20 per query: greedily
  pick argmax λ·rel − (1−λ)·max-sim-to-selected. Greedy selection is
  inherently sequential per query → applyInPandas per q_id (bounded
  20-candidate groups); rows-only with an independent Python oracle.
- q_dtw_daily: dynamic time warping distance between event types'
  normalized daily-volume curves — the alignment-robust series
  similarity (Euclidean penalizes phase shift; DTW warps it away).
  The DP is per-pair procedural → pandas UDF over the |types|² pair
  frame; rows-only with a hand-built DP oracle in tests.

At 100 TB: RBO joins two depth-k frames; MMR groups are k-bounded per
query; DTW pairs carry |days|-length arrays, not events.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import relevance
from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs, _emb
from arrow_supercluster_spark.plans.registry_ext27 import (
    _RRF_TERMS,
    _SQL_TF_RANK,
)
from arrow_supercluster_spark.sources.tables import read_events

_RBO_P = 0.9
_RBO_D = 10


@register(
    "q_rbo",
    f"""
    WITH a AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS ra
      FROM ({relevance.sql_bm25_topk(_RRF_TERMS, _RBO_D, SQL_TOKS)})
    ),
    b AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rb
      FROM (SELECT * FROM ({_SQL_TF_RANK}) LIMIT {_RBO_D})
    ),
    shared AS (
      SELECT greatest(a.ra, b.rb) AS first_depth
      FROM a JOIN b ON a.doc_id = b.doc_id
    ),
    grid AS (SELECT i AS d FROM unnest(generate_series(1, {_RBO_D})) u(i)),
    agree AS (
      SELECT g.d,
             CAST(count(bo.first_depth) AS BIGINT) AS n_overlap,
             count(bo.first_depth) * 1.0 / g.d AS agreement
      FROM grid g LEFT JOIN shared bo ON bo.first_depth <= g.d
      GROUP BY g.d
    )
    SELECT o.d, o.n_overlap, ROUND(o.agreement, 6) AS agreement,
           ROUND((1 - {_RBO_P}) * SUM(pow({_RBO_P}, i.d - 1) * i.agreement),
                 6) AS rbo_cum
    FROM agree o JOIN agree i ON i.d <= o.d
    GROUP BY o.d, o.n_overlap, o.agreement
    """,
)
def q_rbo(spark, sf_dir):
    """Rank-biased overlap between the BM25 and TF top-10 rankings:
    per-depth overlap via the first_depth = max(rank_a, rank_b) trick
    (a shared doc counts at every depth ≥ where BOTH lists contain it),
    cumulative RBO via a 10×10 triangular self-join — no windows beyond
    the TakeOrdered-bounded rank assignment q_rrf_fusion established."""
    docs = _docs(spark, sf_dir)
    bm25 = relevance.bm25_topk(docs, _RRF_TERMS, k=_RBO_D)
    a = bm25.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("ra"),
    )
    toks = tokenize(F.col("text"))
    tf = (
        docs.select(
            "doc_id", F.size(toks).alias("dl"), F.explode(toks).alias("tok")
        )
        .filter(F.col("tok").isin(_RRF_TERMS))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.count(F.lit(1)) * F.lit(1.0) / F.first("dl"), 6
            ).alias("score")
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(_RBO_D)
    )
    b = tf.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), "doc_id"))
        .alias("rb"),
    )
    both = a.join(b, "doc_id").select(
        F.greatest("ra", "rb").alias("first_depth")
    )
    grid = spark.range(1, _RBO_D + 1).select(F.col("id").alias("d"))
    agree = (
        grid.join(both, both.first_depth <= grid.d, "left")
        .groupBy("d")
        .agg(
            F.count("first_depth").alias("n_overlap"),
            (F.count("first_depth") * F.lit(1.0) / F.col("d")).alias(
                "agreement"
            ),
        )
    )
    o = agree.select(
        F.col("d").alias("od"),
        F.col("n_overlap").alias("on"),
        F.col("agreement").alias("oa"),
    )
    return (
        o.join(agree, F.col("d") <= F.col("od"))
        .groupBy("od", "on", "oa")
        .agg(
            F.round(
                (1 - _RBO_P)
                * F.sum(F.pow(F.lit(_RBO_P), F.col("d") - 1) * F.col("agreement")),
                6,
            ).alias("rbo_cum")
        )
        .select(
            F.col("od").alias("d"),
            F.col("on").alias("n_overlap"),
            F.round("oa", 6).alias("agreement"),
            "rbo_cum",
        )
    )


_MMR_LAMBDA = 0.7
_MMR_CAND = 20
_MMR_K = 5

# SQL twin (r7): the greedy selection unrolls into _MMR_K CTE steps —
# step t ranks the not-yet-selected candidates by the MMR score rounded
# to 9 decimals with a (cos DESC, vec_id ASC) tiebreak and keeps row 1.
# The Spark kernel applies the IDENTICAL argmax key (round-9 score,
# then candidate sort order), so the only cross-engine surface is
# float-summation order inside the dot products (~1e-16), absorbed by
# the rounding.  MATERIALIZED is load-bearing: sel{t} references
# sel{t-1} three times; default inlining would re-expand the chain
# ~3^k times.
_MMR_COS_PAIR = (
    "list_inner_product({a}, {b}) / (sqrt(list_inner_product({a}, {a}))"
    " * sqrt(list_inner_product({b}, {b})))"
)


def _mmr_step_sql(t: int) -> str:
    lam, dis = _MMR_LAMBDA, 1 - _MMR_LAMBDA
    pair = _MMR_COS_PAIR.format(a="c2.cv", b="sc.cv")
    return f"""
    pick{t} AS MATERIALIZED (
      SELECT q_id, CAST({t} AS INTEGER) AS sel_rank, vec_id, cos FROM (
        SELECT c.q_id, c.vec_id, c.cos,
               row_number() OVER (
                 PARTITION BY c.q_id
                 ORDER BY round({lam} * c.cos - {dis} * d.mx, 9) DESC,
                          c.cos DESC, c.vec_id) AS rn
        FROM cand c
        JOIN (
          SELECT c2.q_id, c2.vec_id, MAX({pair}) AS mx
          FROM cand c2
          JOIN sel{t - 1} s ON s.q_id = c2.q_id
          JOIN cvec sc ON sc.vec_id = s.vec_id
          GROUP BY c2.q_id, c2.vec_id
        ) d ON d.q_id = c.q_id AND d.vec_id = c.vec_id
        WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} s2
                          WHERE s2.q_id = c.q_id
                            AND s2.vec_id = c.vec_id)
      ) WHERE rn = 1
    ),
    sel{t} AS MATERIALIZED (
      SELECT * FROM sel{t - 1} UNION ALL SELECT * FROM pick{t}
    )"""


_MMR_SQL = (
    f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
    cvec AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id >= 10
    ),
    scored AS (
      SELECT q.q_id, cvec.vec_id,
             round(CASE WHEN sqrt(list_inner_product(q.qv, q.qv))
                             * sqrt(list_inner_product(cvec.cv, cvec.cv))
                             = 0
                        THEN 0.0
                        ELSE list_inner_product(q.qv, cvec.cv)
                             / (sqrt(list_inner_product(q.qv, q.qv))
                                * sqrt(list_inner_product(cvec.cv,
                                                          cvec.cv)))
                   END, 6) AS cos
      FROM q, cvec
    ),
    cand AS MATERIALIZED (
      SELECT s.q_id, s.vec_id, s.cos, cvec.cv
      FROM (SELECT q_id, vec_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, vec_id) AS rn
            FROM scored) s
      JOIN cvec ON cvec.vec_id = s.vec_id
      WHERE s.rn <= {_MMR_CAND}
    ),
    sel1 AS MATERIALIZED (
      SELECT q_id, CAST(1 AS INTEGER) AS sel_rank, vec_id, cos FROM (
        SELECT q_id, vec_id, cos,
               row_number() OVER (
                 PARTITION BY q_id
                 ORDER BY round({_MMR_LAMBDA} * cos, 9) DESC,
                          cos DESC, vec_id) AS rn
        FROM cand
      ) WHERE rn = 1
    ),"""
    + ",".join(_mmr_step_sql(t) for t in range(2, _MMR_K + 1))
    + f"""
    SELECT q_id, sel_rank, vec_id, cos AS mmr_rel
    FROM sel{_MMR_K} ORDER BY q_id, sel_rank
    """
)


@register("q_mmr_rerank", _MMR_SQL)
def q_mmr_rerank(spark, sf_dir):
    """MMR diversified rerank: for each query (vec_id<10), take the
    exact-cosine top-20 candidates, then greedily select 5 maximizing
    λ·relevance − (1−λ)·max cosine-to-already-selected. Sequential per
    query → applyInPandas over q_id groups of ≤20 rows each — the
    candidate generation (broadcast cosine + partial top-k) is the
    distributed 99%; the greedy tail is O(k·|cand|) per query.
    SQL twin since r7: the k greedy steps unroll as CTEs; both sides
    take the argmax of the score ROUNDED TO 9 with a (cos DESC,
    vec_id ASC) tiebreak, so selection is order-free and cross-engine
    deterministic.  Python oracle in tests/test_batch89.py."""
    import numpy as np
    import pandas as pd

    from arrow_supercluster_spark.operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    cand = cosine_topk(corpus, queries, k=_MMR_CAND).join(
        emb.select(F.col("vec_id"), F.col("embedding").alias("cv")),
        "vec_id",
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cos", "vec_id"], ascending=[False, True])
        vecs = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        rel = pdf["cos"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        chosen: list[int] = []
        for _ in range(min(_MMR_K, len(pdf))):
            best, best_s = None, -np.inf
            # iteration follows the (cos DESC, vec_id ASC) sort, so
            # taking the FIRST strict round-9 maximum is exactly the
            # SQL twin's (score9 DESC, cos DESC, vec_id ASC) row 1
            for i in range(len(pdf)):
                if i in chosen:
                    continue
                div = (
                    max(float(vecs[i] @ vecs[j]) for j in chosen)
                    if chosen
                    else 0.0
                )
                s = round(
                    _MMR_LAMBDA * float(rel[i]) - (1 - _MMR_LAMBDA) * div,
                    9,
                )
                if s > best_s:
                    best, best_s = i, s
            chosen.append(best)
        return pd.DataFrame(
            {
                "q_id": pdf["q_id"].iloc[0],
                "sel_rank": range(1, len(chosen) + 1),
                "vec_id": [int(ids[i]) for i in chosen],
                "mmr_rel": [round(float(rel[i]), 6) for i in chosen],
            }
        )

    return cand.groupBy("q_id").applyInPandas(
        mmr, "q_id long, sel_rank int, vec_id long, mmr_rel double"
    )


_DTW_UNROLL = 62  # curves are ≤31 days each → ≤62 anti-diagonal waves


def _dtw_sql(unroll: int = _DTW_UNROLL) -> str:
    """Generate the bounded-DP-unroll twin (VERDICT r7 "Next round" #5
    family): the DTW grid DP as `unroll` anti-diagonal wave CTEs — wave
    K computes every cell with i+j = K from the accumulated relation of
    earlier cells (missing boundary cells are +inf by absence; the
    (0,0)=0 seed row makes (1,1) well-defined).  Only the final rounded
    DISTANCE is emitted (no path), so the 1e-16 z-normalization
    differences between numpy's pairwise mean/std and SQL AVG cannot
    surface: min() is order-free on values and the output rounds at
    1e-6."""
    waves = []
    for k in range(2, unroll + 1):
        waves.append(f""",
    new{k} AS MATERIALIZED (
      SELECT co.a, co.b, co.i, co.j, co.c + MIN(w.v) AS v
      FROM cost co
      JOIN w{k - 1} w ON w.a = co.a AND w.b = co.b
       AND ((w.i = co.i - 1 AND w.j = co.j)
         OR (w.i = co.i AND w.j = co.j - 1)
         OR (w.i = co.i - 1 AND w.j = co.j - 1))
      WHERE co.i + co.j = {k}
      GROUP BY co.a, co.b, co.i, co.j, co.c
    ),
    w{k} AS MATERIALIZED (
      SELECT a, b, i, j, v FROM w{k - 1}
      UNION ALL
      SELECT a, b, i, j, v FROM new{k}
    )""")
    return f"""
    WITH daily AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    idx AS MATERIALIZED (
      SELECT event_type, n,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    ),
    curves AS MATERIALIZED (
      SELECT i.event_type, i.rn,
             (i.n - s.mu) / (CASE WHEN s.sd = 0 THEN 1.0 ELSE s.sd END)
               AS x
      FROM idx i
      JOIN (
        SELECT event_type, AVG(n * 1.0) AS mu,
               sqrt(AVG((n - mu2) * (n - mu2))) AS sd
        FROM (
          SELECT event_type, n,
                 AVG(n * 1.0) OVER (PARTITION BY event_type) AS mu2
          FROM idx
        ) GROUP BY event_type
      ) s ON s.event_type = i.event_type
    ),
    lens AS MATERIALIZED (
      SELECT event_type, MAX(rn) AS n FROM curves GROUP BY 1
    ),
    pairs AS MATERIALIZED (
      SELECT x.event_type AS a, y.event_type AS b
      FROM lens x JOIN lens y ON x.event_type < y.event_type
    ),
    cost AS MATERIALIZED (
      SELECT p.a, p.b, xa.rn AS i, xb.rn AS j, ABS(xa.x - xb.x) AS c
      FROM pairs p
      JOIN curves xa ON xa.event_type = p.a
      JOIN curves xb ON xb.event_type = p.b
    ),
    w1 AS MATERIALIZED (
      SELECT a, b, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS j,
             0.0 AS v
      FROM pairs
    ){"".join(waves)}
    SELECT w.a, w.b, round(w.v, 6) AS dtw_dist
    FROM w{unroll} w
    JOIN lens la ON la.event_type = w.a
    JOIN lens lb ON lb.event_type = w.b
    WHERE w.i = la.n AND w.j = lb.n
    ORDER BY w.a, w.b
    """


@register("q_dtw_daily", _dtw_sql())
def q_dtw_daily(spark, sf_dir):
    """DTW distance between every pair of event types' z-normalized
    daily-volume curves. The curves collapse to |types| short arrays
    (one day-keyed agg), the pair frame is |types|², and the O(n²) DP
    runs vectorized-by-row in a pandas UDF. SQL twin since round 8:
    the same DP as 62 generated anti-diagonal wave CTEs (_dtw_sql);
    an independent DP oracle lives in tests/test_batch89.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ev = read_events(spark, sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("event_type")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("day", "n"))),
                lambda s: s.n.cast("double"),
            ).alias("curve")
        )
    )
    a = daily.select(
        F.col("event_type").alias("a"), F.col("curve").alias("ca")
    )
    b = daily.select(
        F.col("event_type").alias("b"), F.col("curve").alias("cb")
    )

    global pd_dtw_mod
    import pandas as pd_dtw_mod  # noqa: F401 (type-hint resolution)

    @pandas_udf("double")
    def dtw(sa: "pd_dtw_mod.Series", sb: "pd_dtw_mod.Series") -> "pd_dtw_mod.Series":
        out = []
        for xa, xb in zip(sa.tolist(), sb.tolist()):
            x = np.asarray(xa, dtype=float)
            y = np.asarray(xb, dtype=float)
            x = (x - x.mean()) / (x.std() or 1.0)
            y = (y - y.mean()) / (y.std() or 1.0)
            n, m = len(x), len(y)
            D = np.full((n + 1, m + 1), np.inf)
            D[0, 0] = 0.0
            for i in range(1, n + 1):
                c = np.abs(x[i - 1] - y)
                for j in range(1, m + 1):
                    D[i, j] = c[j - 1] + min(
                        D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
                    )
            out.append(round(float(D[n, m]), 6))
        return pd_dtw_mod.Series(out, dtype="float64")

    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", dtw(F.col("ca"), F.col("cb")).alias("dtw_dist"))
    )
