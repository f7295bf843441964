"""Corpus relevance + language-model quality scoring.

Two standard training-data-pipeline scorers the registry exposes as
oracle-checked queries:

* :func:`bm25_topk` — Okapi BM25 keyword relevance over the corpus, the
  classic retrieval scorer (Robertson & Spärck Jones; public formula).
  Scale shape: the corpus is exploded ONLY on the query terms (postings
  for a handful of terms — a tiny fraction of the token stream), the
  per-term document frequencies and the corpus-level (N, avgdl) scalars
  are broadcast, and the final top-k is a TakeOrderedAndProject — no
  full-corpus shuffle anywhere.

* :func:`unigram_logprob` — mean unigram log-probability per document
  against a corpus-fitted top-V vocabulary (the CCNet-style cheap LM
  quality signal; out-of-vocabulary tokens get a constant smoothed
  count). Scale shape: one token-keyed word-count aggregation fits the
  vocabulary (map-side partial agg, V rows out); scoring then never
  shuffles the corpus — the vocabulary is collapsed into a broadcast
  map literal and each document is scored by a narrow higher-order
  aggregate over its own token array.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import normalize_text, tokenize

# Okapi BM25 constants (the universally-published defaults)
K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Top-`k` documents by BM25 score for the bag-of-words query `terms`.

    Returns (doc_id, score, n_hits) ordered by (score desc, doc_id).
    Scores are rounded to 6 decimals BEFORE ranking so the ordering is
    reproducible across engines (a 1-ulp libm difference can otherwise
    flip a rank at the top-k boundary).
    """
    toks = tokenize(F.col(text))
    sized = docs.select(key, F.size(toks).alias("dl"), toks.alias("toks"))

    # corpus scalars: N docs, average doc length — one tiny agg, broadcast
    stats = sized.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # postings restricted to the query terms: explode, filter, count.
    # The filter runs inside the generator projection, so only matching
    # tokens survive the explode — the shuffle carries per-(doc, term)
    # counts for |terms| terms, not the token stream.
    tf = (
        sized.select(key, "dl", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(terms))
        .groupBy(key, "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    # document frequency per term: ≤ |terms| rows, broadcast back
    # (tf already has one row per (doc, term), so a plain count is the df)
    df_counts = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term_score = idf * (
        F.col("tf")
        * (K1 + 1)
        / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
    )

    scored = (
        tf.join(F.broadcast(df_counts), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy(key)
        .agg(
            F.round(F.sum(term_score), 6).alias("score"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(key)).limit(k)


def sql_bm25_topk(terms: list[str], k: int, sql_toks: str) -> str:
    """DuckDB twin of :func:`bm25_topk` (same formula, same rounding)."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH sized AS (
      SELECT doc_id, len({sql_toks}) AS dl, {sql_toks} AS toks FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM sized),
    tf AS (
      SELECT doc_id, dl, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM sized)
      WHERE tok IN ({terms_sql})
      GROUP BY 1, 2, 3
    ),
    dfc AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
    SELECT doc_id,
           round(SUM(
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * ({K1} + 1)
             / (tf + {K1} * (1 - {B} + {B} * dl / avgdl))
           ), 6) AS score,
           COUNT(*) AS n_hits
    FROM tf JOIN dfc USING (tok) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT {k}
    """


OOV_COUNT = 0.5  # smoothed pseudo-count for out-of-vocabulary tokens


def unigram_logprob(
    docs: DataFrame,
    vocab_size: int = 1000,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    top-`vocab_size` unigram distribution — the cheap LM-quality signal
    (high = ordinary text, low = junk/outliers).

    Returns (doc_id, n_tokens, avg_logprob) with avg_logprob rounded to
    6 decimals. The vocabulary (token → ln p) is collapsed to a driver-
    side literal map (vocab_size entries — the broadcast-dim pattern, as
    with IVF centroids), so scoring is a narrow per-row higher-order
    fold: the corpus is never exploded or shuffled for scoring.
    """
    toks_col = tokenize(F.col(text))
    toked = docs.select(key, toks_col.alias("toks"))

    counts = (
        toked.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").alias("t")).collect()[0]["t"]
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("tok")).limit(vocab_size).collect()
    )

    # token → ln(count / total), as one literal map expression
    lp = {r["tok"]: math.log(r["c"] / total) for r in vocab}
    oov = math.log(OOV_COUNT / total)
    entries = [x for t, v in sorted(lp.items()) for x in (F.lit(t), F.lit(v))]
    lp_map = F.create_map(*entries)

    # try_element_at: ANSI mode makes plain map[key] raise on missing keys;
    # the OOV fallback needs the NULL-returning probe.
    score = F.aggregate(
        "toks",
        F.lit(0.0),
        lambda acc, t: acc + F.coalesce(F.try_element_at(lp_map, t), F.lit(oov)),
    )
    return toked.select(
        key,
        F.size("toks").alias("n_tokens"),
        F.round(score / F.size("toks"), 6).alias("avg_logprob"),
    )


def sql_unigram_logprob(vocab_size: int, sql_toks: str) -> str:
    """DuckDB twin: same vocabulary rule (count desc, token asc, LIMIT V),
    same OOV smoothing, same rounding."""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({sql_toks}) AS tok FROM documents
    ),
    counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
    total AS (SELECT SUM(c) AS t FROM counts),
    vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT {vocab_size})
    SELECT doc_id, COUNT(*) AS n_tokens,
           round(SUM(ln(COALESCE(v.c, {OOV_COUNT}) / total.t)) / COUNT(*), 6)
             AS avg_logprob
    FROM toks LEFT JOIN vocab v USING (tok) CROSS JOIN total
    GROUP BY doc_id
    """


def bigram_logprob(
    docs: DataFrame,
    lam: float = 0.7,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Per-document mean INTERPOLATED-BIGRAM log-probability under the
    corpus's own counts — the step up from unigram_logprob (Jelinek-
    Mercer interpolation, public formula):

        P(y|x) = lam * c(x,y)/c(x)  +  (1-lam) * c(y)/N

    c(x) is the corpus unigram count (never 0 — every scored token is
    by construction in the corpus), so unseen bigrams back off to the
    unigram term and the log is always defined. Documents with < 2
    tokens have no bigrams and are excluded (both engines).

    Returns (doc_id, n_bigrams, avg_logprob) rounded to 6.

    Scale shape: bigrams come from an in-row zip of the token array with
    its own shift (no second explode pass, same trick as the PMI miner);
    the bigram count table is joined on the (x, y) pair key — a plain
    equi-join that AQE broadcasts when the vocabulary is small and
    shuffles by key when it is not; unigram counts and the corpus total
    ride as broadcast/1-row sides. The corpus text itself never
    re-shuffles for scoring."""
    toked = docs.select(key, tokenize(F.col(text)).alias("t")).filter(
        F.size("t") >= 2
    )
    bigr = toked.select(
        key,
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))).alias("x"),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))).alias("y"),
            )
        ).alias("p"),
    ).select(key, F.col("p.x").alias("x"), F.col("p.y").alias("y"))

    uni = (
        toked.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = uni.agg(F.sum("c").alias("n"))
    bi = bigr.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))

    ux = uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    scored = (
        bigr.join(bi, ["x", "y"], "left")
        .join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(n_total))
    )
    lp = F.log(
        F.lit(lam) * F.coalesce(F.col("c_xy"), F.lit(0)) / F.col("c_x")
        + F.lit(1.0 - lam) * F.col("c_y") / F.col("n")
    )
    return (
        scored.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(lp) / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


def sql_bigram_logprob(lam: float, sql_toks: str) -> str:
    """DuckDB twin of bigram_logprob: same interpolation, same exclusion
    of sub-2-token docs, same rounding."""
    return f"""
    WITH toked AS (
      SELECT doc_id, {sql_toks} AS t FROM documents
    ),
    bigr AS (
      SELECT doc_id, t[i] AS x, t[i+1] AS y
      FROM toked, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
    ),
    uni AS (
      SELECT tok, COUNT(*) AS c FROM (
        SELECT unnest(t) AS tok FROM toked WHERE len(t) >= 2
      ) flat GROUP BY 1
    ),
    n_total AS (SELECT SUM(c) AS n FROM uni),
    bi AS (SELECT x, y, COUNT(*) AS c_xy FROM bigr GROUP BY 1, 2)
    SELECT bigr.doc_id, COUNT(*) AS n_bigrams,
           round(SUM(ln({lam} * COALESCE(bi.c_xy, 0) / ux.c
                         + {1.0 - lam} * uy.c / n_total.n)) / COUNT(*), 6)
             AS avg_logprob
    FROM bigr
    LEFT JOIN bi USING (x, y)
    JOIN uni ux ON ux.tok = bigr.x
    JOIN uni uy ON uy.tok = bigr.y
    CROSS JOIN n_total
    GROUP BY bigr.doc_id
    """
