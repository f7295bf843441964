"""Round-5 registry additions, batch 103 — filtering/behavioral/
information-theoretic signals and two relational learners:

- q_kalman_1d: local-level Kalman filter over daily event counts — the
  optimal-gain sibling of q_ema_daily's fixed-α smoothing. The coupled
  (mean, variance) recurrence folds over ONE sorted calendar-bounded
  array (the q_holt_linear machinery); oracle = recursive CTE.
- q_token_entropy: per-document Shannon entropy of the token
  distribution — the information-density quality signal (low entropy =
  repetitive/template text). Token-keyed agg + doc-keyed rollup.
- q_burstiness: per-user inter-arrival burstiness B = (σ−μ)/(σ+μ)
  (Goh & Barabási) — bot/human behavioral separation; lag over a
  PARTITIONED (per-user) window.
- q_decision_stump: exhaustive single-split learner on an embedding
  dimension vs the label: 17 literal candidate thresholds × weighted
  Gini impurity, min-impurity argmin with deterministic tie-break. The
  candidate grid rides as literals — one pass, no sort.
- q_naive_bayes_lang: multinomial naive Bayes language classifier
  trained relationally (add-1 smoothed per-lang token log-probs +
  log-priors), scored per doc via a |langs|-way join, argmax with
  min-lang tie-break. The confusion against the true label is the
  model-quality readout downstream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

_KAL_Q = 10.0  # process noise variance
_KAL_R = 100.0  # observation noise variance
_BURST_MIN = 5
_STUMP_DIM = 1  # 1-based embedding dimension the stump splits on
_STUMP_THRESHOLDS = [round(-2.0 + 0.25 * i, 2) for i in range(17)]


@register(
    "q_kalman_1d",
    f"""
    WITH RECURSIVE daily AS (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM idx),
    rec AS (
      SELECT 1 AS t, i.y AS m,
             -- CAST: bare decimal literals would fix the recursive
             -- columns to DECIMAL(4,1) and round p/k every iteration
             CAST({_KAL_R} AS DOUBLE) AS p, CAST(0.0 AS DOUBLE) AS k
      FROM (SELECT y FROM idx WHERE t = 1) i
      UNION ALL
      SELECT r.t + 1,
             r.m + ((r.p + {_KAL_Q}) / ((r.p + {_KAL_Q}) + {_KAL_R}))
                 * (i.y - r.m),
             (1 - (r.p + {_KAL_Q}) / ((r.p + {_KAL_Q}) + {_KAL_R}))
                 * (r.p + {_KAL_Q}),
             (r.p + {_KAL_Q}) / ((r.p + {_KAL_Q}) + {_KAL_R})
      FROM rec r JOIN idx i ON i.t = r.t + 1
    )
    SELECT n.n_days, round(r.m, 6) AS level,
           round(r.p, 6) AS variance, round(r.k, 6) AS gain
    FROM rec r CROSS JOIN n WHERE r.t = n.n_days
    """,
)
def q_kalman_1d(spark, sf_dir):
    """Local-level Kalman filter (q={q}, r={r}) over daily counts:
    p⁻=p+q; K=p⁻/(p⁻+r); m←m+K(y−m); p←(1−K)p⁻; init m=y₁, p=r. Folded
    over one sorted calendar-bounded array inside a single-row agg (the
    q_holt_linear shape — no window, no driver loop, no collect); the
    steady-state gain it converges to is the optimal version of
    q_ema_daily's hand-picked α.""".format(q=_KAL_Q, r=_KAL_R)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "y"))).alias("s")
    )
    q, r = _KAL_Q, _KAL_R
    fold = F.aggregate(
        F.slice(F.col("ys"), 2, F.size("ys")),
        F.struct(
            F.element_at("ys", 1).alias("m"),
            F.lit(r).alias("p"),
            F.lit(0.0).alias("k"),
        ),
        lambda acc, y: F.struct(
            (
                acc["m"]
                + ((acc["p"] + q) / ((acc["p"] + q) + r)) * (y - acc["m"])
            ).alias("m"),
            (
                (1 - (acc["p"] + q) / ((acc["p"] + q) + r)) * (acc["p"] + q)
            ).alias("p"),
            ((acc["p"] + q) / ((acc["p"] + q) + r)).alias("k"),
        ),
    )
    return (
        series.select(F.transform(F.col("s"), lambda x: x["y"]).alias("ys"))
        .select(F.size("ys").alias("n_days"), fold.alias("st"))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.round(F.col("st")["m"], 6).alias("level"),
            F.round(F.col("st")["p"], 6).alias("variance"),
            F.round(F.col("st")["k"], 6).alias("gain"),
        )
    )


@register(
    "q_token_entropy",
    f"""
    WITH tc AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents)
      GROUP BY 1, 2
    ),
    dn AS (
      SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_distinct FROM tc GROUP BY 1
    )
    SELECT tc.doc_id,
           CAST(dn.n AS BIGINT) AS n_tokens,
           CAST(dn.n_distinct AS BIGINT) AS n_distinct,
           round(-SUM((tc.c * 1.0 / dn.n) * ln(tc.c * 1.0 / dn.n)), 6)
             AS entropy
    FROM tc JOIN dn USING (doc_id)
    GROUP BY tc.doc_id, dn.n, dn.n_distinct
    """,
)
def q_token_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution, −Σ p ln p —
    low entropy flags repetitive/template text that length rules miss.
    Token-keyed count agg (map-side combined) → doc totals → doc-keyed
    entropy sum; every shuffle is keyed, nothing is per-corpus."""
    tc = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dn = tc.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    p = F.col("c") * F.lit(1.0) / F.col("n")
    return (
        tc.join(dn, "doc_id")
        .groupBy("doc_id", "n", "n_distinct")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "entropy",
        )
    )


@register(
    "q_burstiness",
    f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    stats AS (
      SELECT user_id,
             COUNT(*) AS n_gaps,
             AVG(gap_us / 1e6) AS mu,
             stddev_samp(gap_us / 1e6) AS sigma
      FROM gaps WHERE gap_us IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           round(mu, 6) AS mean_gap_s, round(sigma, 6) AS sd_gap_s,
           round((sigma - mu) / (sigma + mu), 6) AS burstiness
    FROM stats WHERE n_gaps >= {_BURST_MIN}
    """,
)
def q_burstiness(spark, sf_dir):
    """Per-user inter-arrival burstiness B = (σ−μ)/(σ+μ) (Goh &
    Barabási): B→−1 periodic, 0 Poisson, →1 bursty — the behavioral
    bot/human separator. The lag is a PARTITIONED (per-user) window —
    each user's frame is their own event count, hash-spread across
    reducers; no global ordering anywhere."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / 1e6
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.avg("gap_s").alias("mu"),
        F.stddev_samp("gap_s").alias("sigma"),
    )
    return stats.filter(F.col("n_gaps") >= _BURST_MIN).select(
        "user_id",
        "n_gaps",
        F.round("mu", 6).alias("mean_gap_s"),
        F.round("sigma", 6).alias("sd_gap_s"),
        F.round(
            (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")), 6
        ).alias("burstiness"),
    )


@register(
    "q_decision_stump",
    f"""
    WITH pts AS (
      SELECT CAST(embedding[{_STUMP_DIM}] AS DOUBLE) AS x, label
      FROM embeddings
    ),
    th AS (SELECT unnest([{", ".join(str(t) for t in _STUMP_THRESHOLDS)}]) AS thr),
    sides AS (
      SELECT th.thr, (pts.x <= th.thr) AS left_side, pts.label,
             COUNT(*) AS c
      FROM pts CROSS JOIN th
      GROUP BY 1, 2, 3
    ),
    side_tot AS (
      SELECT thr, left_side, SUM(c) AS n FROM sides GROUP BY 1, 2
    ),
    tot AS (SELECT thr, SUM(c) AS n_all FROM sides GROUP BY 1),
    gini AS (
      SELECT s.thr,
             SUM(CASE WHEN s.left_side THEN s.c ELSE 0 END) AS n_left,
             SUM(CASE WHEN s.left_side THEN 0 ELSE s.c END) AS n_right,
             SUM((t.n * 1.0 / tot.n_all)
                 * (s.c * 1.0 / t.n) * (s.c * 1.0 / t.n)) AS sum_p2w
      FROM sides s
      JOIN side_tot t ON t.thr = s.thr AND t.left_side = s.left_side
      JOIN tot ON tot.thr = s.thr
      GROUP BY s.thr
    )
    SELECT thr AS threshold,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           round(1.0 - sum_p2w, 6) AS weighted_gini
    FROM gini
    ORDER BY round(1.0 - sum_p2w, 6), thr
    LIMIT 1
    """,
)
def q_decision_stump(spark, sf_dir):
    """Exhaustive decision stump on embedding dim {d} vs the label:
    for each of {k} literal thresholds, weighted Gini impurity
    Σ_side (n_side/n)·(1−Σ_c p_c²); argmin with smaller-threshold
    tie-break. The candidate grid rides as literals, so the whole
    search is one keyed agg chain over (threshold, side, label) — no
    sort of the data, no per-threshold pass. The one-node base case of
    distributed tree learning.""".format(
        d=_STUMP_DIM, k=len(_STUMP_THRESHOLDS)
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.element_at(F.col("embedding").cast("array<double>"), _STUMP_DIM)
        .alias("x"),
        "label",
    )
    th = spark.createDataFrame(
        [(t,) for t in _STUMP_THRESHOLDS], "thr double"
    )
    sides = (
        emb.crossJoin(F.broadcast(th))
        .groupBy("thr", (F.col("x") <= F.col("thr")).alias("left_side"), "label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    side_tot = sides.groupBy("thr", "left_side").agg(F.sum("c").alias("n"))
    tot = sides.groupBy("thr").agg(F.sum("c").alias("n_all"))
    j = sides.join(side_tot, ["thr", "left_side"]).join(tot, "thr")
    p = F.col("c") * F.lit(1.0) / F.col("n")
    w = F.col("n") * F.lit(1.0) / F.col("n_all")
    gini = j.groupBy("thr").agg(
        F.sum(F.when(F.col("left_side"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_left"),
        F.sum(F.when(F.col("left_side"), 0).otherwise(F.col("c")))
        .cast("long")
        .alias("n_right"),
        F.round(1.0 - F.sum(w * p * p), 6).alias("weighted_gini"),
    )
    return (
        gini.select(
            F.col("thr").alias("threshold"), "n_left", "n_right",
            "weighted_gini",
        )
        .orderBy("weighted_gini", "threshold")
        .limit(1)
    )


@register(
    "q_naive_bayes_lang",
    f"""
    WITH t AS (
      SELECT doc_id, lang, unnest({SQL_TOKS}) AS w FROM documents
    ),
    langs AS (
      SELECT lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_toks
      FROM t GROUP BY lang
    ),
    corpus AS (
      SELECT (SELECT COUNT(DISTINCT doc_id) FROM t) AS total_docs,
             (SELECT COUNT(DISTINCT w) FROM t) AS v
    ),
    lw AS (
      SELECT lang, w, COUNT(*) AS c FROM t GROUP BY lang, w
    ),
    doc_tok AS (
      SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w
    ),
    scores AS (
      SELECT d.doc_id, l.lang,
             ln(l.n_docs * 1.0 / corpus.total_docs)
             + SUM(d.c * ln((coalesce(lw.c, 0) + 1.0) / (l.n_toks + corpus.v)))
               AS score
      FROM doc_tok d
      CROSS JOIN langs l
      CROSS JOIN corpus
      LEFT JOIN lw ON lw.lang = l.lang AND lw.w = d.w
      GROUP BY d.doc_id, l.lang, l.n_docs, l.n_toks,
               corpus.total_docs, corpus.v
    ),
    best AS (
      SELECT doc_id, MAX(score) AS best_score FROM scores GROUP BY doc_id
    )
    SELECT s.doc_id, docs.lang AS true_lang,
           MIN(s.lang) AS pred_lang,
           (MIN(s.lang) = docs.lang) AS correct
    FROM scores s
    JOIN best ON best.doc_id = s.doc_id AND s.score >= best.best_score - 1e-9
    JOIN documents docs ON docs.doc_id = s.doc_id
    GROUP BY s.doc_id, docs.lang
    """,
)
def q_naive_bayes_lang(spark, sf_dir):
    """Multinomial naive Bayes language ID, trained relationally:
    per-lang token log-probs (add-1 over the corpus vocabulary) +
    log-priors; each doc scores against every lang (|langs| ≈ 5 — a
    bounded fan-out join), argmax with min-lang tie-break (ties within
    1e-9 collapse to the lexically smallest lang, exactly mirrored in
    the oracle). Resubstitution setup (trained on the full corpus) —
    deterministic; the `correct` flag against the true label is the
    model readout. Every stage is token- or doc-keyed; the only
    corpus-wide values are the 2-3 scalar totals."""
    t = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("w")
    )
    langs = t.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    corpus = t.agg(
        F.count_distinct("doc_id").alias("total_docs"),
        F.count_distinct("w").alias("v"),
    )
    lw = t.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    doc_tok = t.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("dc"))
    scores = (
        doc_tok.crossJoin(F.broadcast(langs.select(F.col("lang").alias("slang"), "n_docs", "n_toks")))
        .crossJoin(F.broadcast(corpus))
        .join(
            lw.select(F.col("lang").alias("slang"), "w", "c"),
            ["slang", "w"],
            "left",
        )
        .groupBy("doc_id", "slang", "n_docs", "n_toks", "total_docs", "v")
        .agg(
            F.sum(
                F.col("dc")
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                    / (F.col("n_toks") + F.col("v"))
                )
            ).alias("ll")
        )
        .select(
            "doc_id",
            "slang",
            (
                F.log(F.col("n_docs") * F.lit(1.0) / F.col("total_docs"))
                + F.col("ll")
            ).alias("score"),
        )
    )
    best = scores.groupBy("doc_id").agg(F.max("score").alias("best_score"))
    truth = _docs(spark, sf_dir).select("doc_id", F.col("lang").alias("true_lang"))
    return (
        scores.join(best, "doc_id")
        .filter(F.col("score") >= F.col("best_score") - 1e-9)
        .groupBy("doc_id")
        .agg(F.min("slang").alias("pred_lang"))
        .join(truth, "doc_id")
        .select(
            "doc_id",
            "true_lang",
            "pred_lang",
            (F.col("pred_lang") == F.col("true_lang")).alias("correct"),
        )
    )
