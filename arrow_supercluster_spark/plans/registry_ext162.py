"""Round-6 registry additions, batch 157 — retrieval and classifier
evaluation completions:

- q_map_at_k: mean average precision @ k over the embedding
  label-retrieval task (a neighbor is relevant iff it shares the
  query's label) — the order-sensitive retrieval headline next to
  q_knn_accuracy (hit-rate ignores rank) and q_ndcg (graded gains;
  MAP is the binary-relevance standard).
- q_ece: expected calibration error of the deterministic-hash
  probability predictor — Σ n_k/n · |acc_k − conf_k| over 10
  equal-width bins, plus the maximum calibration error. THE
  number quoted for modern-model calibration; q_brier_decomposition's
  reliability term is its squared cousin.
- q_macro_f1: per-class precision/recall/F1 for the stopword-vote
  language detector (the q_lang_confusion task), with macro and
  micro averages — the imbalanced-classes summary a confusion matrix
  owes its reader.

At 100 TB: MAP's neighbor stage is the documented kNN eval kernel
(exact top-k per query; production path = LSH variant); ECE and F1
collapse to ≤10 bins / ≤|langs| rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb
from arrow_supercluster_spark.sources.tables import read_events

_MAP_K = 10
_ECE_BINS = 10
_H_MULT, _H_MOD = 48271, 65537

_SQL_COS = (
    "list_sum(list_transform(range(1, 65), i -> "
    "CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform(range(1, 65), i -> "
    "CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform(range(1, 65), i -> "
    "CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))"
)


# ===========================================================================
# R464 — mean average precision @ k
# ===========================================================================

@register(
    "q_map_at_k",
    f"""
    WITH scored AS (
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
    prec AS (
      SELECT q, rk, rel,
             SUM(rel) OVER (PARTITION BY q ORDER BY rk) * 1.0 / rk
               AS p_at_rk
      FROM topk
    ),
    ap AS (
      SELECT q,
             CASE WHEN SUM(rel) > 0
                  THEN SUM(CASE WHEN rel = 1 THEN p_at_rk ELSE 0 END)
                       / SUM(rel)
                  ELSE 0.0 END AS ap
      FROM prec GROUP BY q
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(AVG(ap), 6) AS map_at_k,
           round(SUM(CASE WHEN ap = 0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS frac_zero_ap
    FROM ap
    """,
)
def q_map_at_k(spark, sf_dir):
    """R464 — MAP@{k} over embedding label retrieval: every vector
    queries the corpus, neighbors rank by (cosine DESC, id) — the
    deterministic tie rule shared with q_knn_accuracy — relevance =
    same label, AP = mean of precision@rank at each relevant hit
    (normalized by hits retrieved within k, the standard cut-off
    convention, stated). The all-pairs frame is the documented
    EVAL-ONLY kernel, executed through the BLAS top-k kernel since r7
    (cosine_topk_gemm with k+1 then self-exclusion — identical result
    up to round-6, ~50x the HOF join; LSH is the production path). sklearn label_ranking_average_precision is
    NOT the same definition; the python oracle replays this one
    exactly.""".format(k=_MAP_K)
    from arrow_supercluster_spark.operators.similarity import (
        cosine_topk_gemm,
    )

    emb = _emb(spark, sf_dir)
    labels = emb.select("vec_id", "label")
    # r7: the all-pairs eval frame runs through the BLAS top-k kernel
    # (one matmul per Arrow batch) with k+1 so dropping the self-match
    # still leaves the exact top-k of the pool-without-self; ranks are
    # then recomputed under the same (cos DESC, id) rule, so the
    # result is identical to the HOF form up to round-6.
    topk1 = cosine_topk_gemm(
        corpus=emb,
        queries=emb.select(F.col("vec_id").alias("q_id"), "embedding"),
        k=_MAP_K + 1,
    ).filter(F.col("vec_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    ranked = (
        topk1.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MAP_K)
        .join(
            labels.select(
                F.col("vec_id").alias("q_id"), F.col("label").alias("ql")
            ),
            "q_id",
        )
        .join(
            labels.select("vec_id", F.col("label").alias("nl")), "vec_id"
        )
        .select(F.col("q_id").alias("q"), "ql", "nl", "rk")
    )
    topk = ranked.select(
        "q",
        "rk",
        F.when(F.col("ql") == F.col("nl"), 1).otherwise(0).alias("rel"),
    )
    wp = Window.partitionBy("q").orderBy("rk")
    prec = topk.select(
        "q",
        "rel",
        (F.sum("rel").over(wp) * 1.0 / F.col("rk")).alias("p_at_rk"),
    )
    ap = prec.groupBy("q").agg(
        F.when(
            F.sum("rel") > 0,
            F.sum(
                F.when(F.col("rel") == 1, F.col("p_at_rk")).otherwise(0.0)
            ) / F.sum("rel"),
        ).otherwise(0.0).alias("ap")
    )
    return ap.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("ap"), 6).alias("map_at_k"),
        F.round(
            F.sum(F.when(F.col("ap") == 0, 1).otherwise(0)) * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("frac_zero_ap"),
    )


# ===========================================================================
# R465 — expected calibration error
# ===========================================================================

@register(
    "q_ece",
    f"""
    WITH scored AS (
      SELECT ((user_id * {_H_MULT}) % {_H_MOD}) * 1.0 / {_H_MOD} AS p,
             CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 90
                           THEN 1 ELSE 0 END) AS INTEGER) AS y
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT CAST(floor(p * {_ECE_BINS}) AS INTEGER) AS b,
             CAST(COUNT(*) AS BIGINT) AS nk,
             AVG(p) AS conf, AVG(y * 1.0) AS acc
      FROM scored GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(nk) AS BIGINT) AS n FROM cells)
    SELECT tot.n AS n_users,
           round(SUM(cells.nk * abs(cells.acc - cells.conf)) / tot.n, 6)
             AS ece,
           round(MAX(abs(cells.acc - cells.conf)), 6) AS mce,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM cells CROSS JOIN tot GROUP BY tot.n
    """,
)
def q_ece(spark, sf_dir):
    """R465 — expected calibration error over the deterministic-hash
    predictor (the q_brier_decomposition frame): ECE = Σ n_k/n ·
    |acc_k − conf_k| over {b} equal-width bins, MCE = the worst bin.
    The predictor's p is uniform-hash noise, so acc_k ≈ base rate in
    every bin and ECE ≈ E|p − base| — large, and the crafted perfect
    predictor in tests drives it to ~0. ≤{b} cells.""".format(
        b=_ECE_BINS
    )
    ev = read_events(spark, sf_dir)
    scored = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90),
                1,
            ).otherwise(0)
        ).alias("y")
    ).select(
        (((F.col("user_id") * _H_MULT) % _H_MOD) * 1.0 / _H_MOD).alias("p"),
        "y",
    )
    cells = scored.groupBy(
        F.floor(F.col("p") * _ECE_BINS).cast("int").alias("b")
    ).agg(
        F.count(F.lit(1)).alias("nk"),
        F.avg("p").alias("conf"),
        F.avg(F.col("y") * 1.0).alias("acc"),
    )
    tot = cells.agg(F.sum("nk").alias("n"))
    return cells.crossJoin(F.broadcast(tot)).groupBy("n").agg(
        F.round(
            F.sum(F.col("nk") * F.abs(F.col("acc") - F.col("conf")))
            / F.max("n"),
            6,
        ).alias("ece"),
        F.round(F.max(F.abs(F.col("acc") - F.col("conf"))), 6).alias(
            "mce"
        ),
        F.count(F.lit(1)).alias("n_bins"),
    ).select(
        F.col("n").cast("long").alias("n_users"),
        "ece",
        "mce",
        F.col("n_bins").cast("long"),
    )


# ===========================================================================
# R466 — per-class precision/recall/F1 + macro/micro
# ===========================================================================

@register(
    "q_macro_f1",
    """
    WITH pred AS (
      SELECT lang AS t,
        (SELECT cand.l FROM (
           SELECT 'en' AS l,
                  len(list_filter(string_split(lower(text), ' '),
                      w -> w IN ('the','and','of','to','a','in','is')))
                    AS hits
           UNION ALL SELECT 'de',
                  len(list_filter(string_split(lower(text), ' '),
                      w -> w IN ('der','die','und','das','ist','ein','zu')))
           UNION ALL SELECT 'fr',
                  len(list_filter(string_split(lower(text), ' '),
                      w -> w IN ('le','la','et','les','des','un','est')))
           UNION ALL SELECT 'es',
                  len(list_filter(string_split(lower(text), ' '),
                      w -> w IN ('el','la','de','que','y','en','los')))
           UNION ALL SELECT 'it',
                  len(list_filter(string_split(lower(text), ' '),
                      w -> w IN ('il','di','che','e','la','un','per')))
         ) cand ORDER BY cand.hits DESC, cand.l LIMIT 1) AS p
      FROM documents
    ),
    per_class AS (
      SELECT c.t AS lang,
             CAST(COALESCE(tp.n, 0) AS BIGINT) AS tp,
             CAST(c.n_true AS BIGINT) AS n_true,
             CAST(COALESCE(pp.n_pred, 0) AS BIGINT) AS n_pred
      FROM (SELECT t, COUNT(*) AS n_true FROM pred GROUP BY t) c
      LEFT JOIN (SELECT t, COUNT(*) AS n FROM pred WHERE t = p
                 GROUP BY t) tp ON tp.t = c.t
      LEFT JOIN (SELECT p, COUNT(*) AS n_pred FROM pred GROUP BY p) pp
        ON pp.p = c.t
    )
    SELECT lang, tp, n_true, n_pred,
           round(tp * 1.0 / NULLIF(n_pred, 0), 6) AS precision_,
           round(tp * 1.0 / n_true, 6) AS recall_,
           round(2.0 * tp / NULLIF(n_pred + n_true, 0), 6) AS f1,
           round((SELECT AVG(2.0 * tp / NULLIF(n_pred + n_true, 0))
                  FROM per_class), 6) AS macro_f1,
           round((SELECT SUM(tp) * 1.0 / SUM(n_true) FROM per_class), 6)
             AS micro_f1
    FROM per_class ORDER BY lang
    """,
)
def q_macro_f1(spark, sf_dir):
    """R466 — per-class P/R/F1 for the stopword-vote language detector
    (the q_lang_id/q_lang_confusion task, re-stated inline so the SQL
    twin is self-contained; ties break to the alphabetically first
    language in both engines): F1 = 2TP/(pred+true) (the harmonic form
    that never divides by zero when TP=0), macro = unweighted class
    mean, micro = ΣTP/Σtrue (= accuracy in single-label tasks). One
    detection pass + three ≤|langs| aggregates. sklearn
    classification_report is the test oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stop = {
        "en": ("the", "and", "of", "to", "a", "in", "is"),
        "de": ("der", "die", "und", "das", "ist", "ein", "zu"),
        "fr": ("le", "la", "et", "les", "des", "un", "est"),
        "es": ("el", "la", "de", "que", "y", "en", "los"),
        "it": ("il", "di", "che", "e", "la", "un", "per"),
    }
    toks = F.split(F.lower(F.col("text")), " ")
    hits = [
        F.struct(
            F.size(
                F.filter(toks, lambda w: w.isin(*words))
            ).alias("hits"),
            F.lit(lang).alias("l"),
        )
        for lang, words in sorted(stop.items())
    ]
    # argmax by (hits DESC, lang ASC): sort ascending on (-hits? no —
    # array_max of struct compares fields in order, so negate via
    # struct(hits, reversed-lang)? Simpler: sort_array desc on
    # (hits, lang_desc_marker) — use aggregate to pick best
    best = F.aggregate(
        F.array(*hits),
        F.struct(
            F.lit(-1).cast("int").alias("hits"),
            F.lit("zz").alias("l"),
        ),
        lambda acc, s: F.when(
            (s.hits > acc.hits)
            | ((s.hits == acc.hits) & (s.l < acc.l)),
            s,
        ).otherwise(acc),
    )
    pred = docs.select(
        F.col("lang").alias("t"), best.getField("l").alias("p")
    )
    c = pred.groupBy("t").agg(F.count(F.lit(1)).alias("n_true"))
    tp = (
        pred.filter(F.col("t") == F.col("p"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("tp0"))
    )
    pp = pred.groupBy("p").agg(F.count(F.lit(1)).alias("n_pred0"))
    per_class = (
        c.join(tp, "t", "left")
        .join(pp, c.t == pp.p, "left")
        .select(
            F.col("t").alias("lang"),
            F.coalesce("tp0", F.lit(0)).cast("long").alias("tp"),
            F.col("n_true").cast("long").alias("n_true"),
            F.coalesce("n_pred0", F.lit(0)).cast("long").alias("n_pred"),
        )
    )
    f1 = 2.0 * F.col("tp") / F.when(
        F.col("n_pred") + F.col("n_true") != 0,
        F.col("n_pred") + F.col("n_true"),
    )
    summary = per_class.agg(
        F.avg(
            2.0 * F.col("tp")
            / F.when(
                F.col("n_pred") + F.col("n_true") != 0,
                F.col("n_pred") + F.col("n_true"),
            )
        ).alias("macro"),
        (F.sum("tp") * 1.0 / F.sum("n_true")).alias("micro"),
    )
    return (
        per_class.crossJoin(F.broadcast(summary))
        .select(
            "lang",
            "tp",
            "n_true",
            "n_pred",
            F.round(
                F.col("tp") * 1.0
                / F.when(F.col("n_pred") != 0, F.col("n_pred")),
                6,
            ).alias("precision_"),
            F.round(F.col("tp") * 1.0 / F.col("n_true"), 6).alias(
                "recall_"
            ),
            F.round(f1, 6).alias("f1"),
            F.round("macro", 6).alias("macro_f1"),
            F.round("micro", 6).alias("micro_f1"),
        )
        .orderBy("lang")
    )
