"""Round-5 registry additions, batch 100 — corpus-curation filters from
the published LLM-data playbooks, plus the PQ search kernel that
completes the product-quantization story:

- q_gopher_rules: the Gopher-style composite document filter (Rae et al.
  2021 §A1.1 adapted to this corpus): token-count bounds, mean-word-
  length bounds, stopword requirement, alphabetic-token fraction,
  lexical-diversity floor — per-rule booleans plus the keep verdict,
  all narrow JVM HOF expressions (no explode, no shuffle).
- q_dup_span_fraction: cross-document duplicated-span analysis (the
  Lee et al. 2022 "Deduplicating Training Data" signal, span form): the
  fraction of each doc's 8-token windows that also occur in ANOTHER
  document. One span-keyed agg + one join — the decontamination shape
  turned on the corpus itself.
- q_dsir_weights: DSIR-style importance weights (Xie et al. 2023):
  target = the 'en' slice, raw = the rest; add-1-smoothed unigram
  log-likelihood ratio averaged over each doc's tokens. Token-keyed
  vocab agg → log-ratio table → token join → per-doc mean; every stage
  keyed, nothing collected.
- q_pq_adc_topk: asymmetric-distance (ADC) top-k search over the PQ
  codes of q_pq_encode (registry_ext22): the query's per-(block, code)
  distance table is tiny (m × ks) and rides as literals; each corpus
  vector's approximate distance is m array lookups over its code array,
  then a TakeOrdered top-10 — the lookup-table scan that makes
  billion-vector search RAM-feasible.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import shingles, tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs, _emb

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
_SPAN_N = 8


@register(
    "q_gopher_rules",
    f"""
    WITH m AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
                   * 1.0 / len(toks), 6) AS mean_word_len,
             len(list_filter(toks,
                 x -> x IN ({", ".join(repr(w) for w in _STOPWORDS)}))) AS n_stop,
             round(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+')))
                   * 1.0 / len(toks), 6) AS alpha_frac,
             round(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS distinct_frac
      FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
      WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, mean_word_len,
           CAST(n_stop AS BIGINT) AS n_stop, alpha_frac, distinct_frac,
           (n_tokens BETWEEN 10 AND 1000) AS pass_len,
           (mean_word_len BETWEEN 3.0 AND 10.0) AS pass_mwl,
           (n_stop >= 2) AS pass_stop,
           (alpha_frac >= 0.8) AS pass_alpha,
           (distinct_frac >= 0.2) AS pass_distinct,
           ((n_tokens BETWEEN 10 AND 1000)
            AND (mean_word_len BETWEEN 3.0 AND 10.0)
            AND n_stop >= 2 AND alpha_frac >= 0.8
            AND distinct_frac >= 0.2) AS keep
    FROM m
    """,
)
def q_gopher_rules(spark, sf_dir):
    """Gopher §A1.1-style composite quality filter, adapted to this
    corpus (bounds documented inline; the corpus is single-line
    punctuation-free synthetic text, so the symbol/bullet/ellipsis line
    rules of the paper are vacuous here and deliberately omitted).
    Spark shape: one narrow projection of HOF expressions per doc — no
    explode, no shuffle; at 100 TB this is a pure map stage that fuses
    into the scan."""
    toks = tokenize(F.col("text"))
    n = F.size(toks)
    mwl = F.round(
        F.aggregate(
            F.transform(toks, lambda x: F.length(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x.cast("long"),
        )
        * F.lit(1.0)
        / n,
        6,
    )
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*[F.lit(w) for w in _STOPWORDS]))
    )
    alpha = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("^[a-z]+$"))) * F.lit(1.0) / n,
        6,
    )
    dfrac = F.round(F.size(F.array_distinct(toks)) * F.lit(1.0) / n, 6)
    m = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            n.alias("n_tokens").cast("long").alias("n_tokens"),
            mwl.alias("mean_word_len"),
            n_stop.cast("long").alias("n_stop"),
            alpha.alias("alpha_frac"),
            dfrac.alias("distinct_frac"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    pass_len = F.col("n_tokens").between(10, 1000)
    pass_mwl = F.col("mean_word_len").between(3.0, 10.0)
    pass_stop = F.col("n_stop") >= 2
    pass_alpha = F.col("alpha_frac") >= 0.8
    pass_distinct = F.col("distinct_frac") >= 0.2
    return m.select(
        "*",
        pass_len.alias("pass_len"),
        pass_mwl.alias("pass_mwl"),
        pass_stop.alias("pass_stop"),
        pass_alpha.alias("pass_alpha"),
        pass_distinct.alias("pass_distinct"),
        (pass_len & pass_mwl & pass_stop & pass_alpha & pass_distinct).alias(
            "keep"
        ),
    )


@register(
    "q_dup_span_fraction",
    f"""
    WITH spans AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, len(toks) - {_SPAN_N} + 1),
               i -> array_to_string(toks[i:i+{_SPAN_N}-1], ' '))) AS g
      FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
      WHERE len(toks) >= {_SPAN_N}
    ),
    multi AS (
      SELECT g FROM spans GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN m.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           round(SUM(CASE WHEN m.g IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS dup_frac
    FROM spans s LEFT JOIN multi m USING (g)
    GROUP BY s.doc_id
    """,
)
def q_dup_span_fraction(spark, sf_dir):
    """Cross-doc duplicated-span fraction: per doc, the share of its
    8-token windows that occur in at least one OTHER document (span
    positions counted, not distinct spans — a doc repeating a shared
    span twice is twice as duplicated). Spark shape: window explode →
    span-keyed distinct-doc agg (map-side combined) → the multi-doc
    span set joins back on the span key → doc-keyed rollup. Two
    shuffles, both keyed — the q_decontaminate shape pointed at the
    corpus itself; at scale the span column would carry xxhash64
    digests instead of strings (exactly the minhash_docs discipline),
    kept as strings here for oracle parity."""
    docs = _docs(spark, sf_dir)
    spans = docs.select(
        "doc_id",
        F.explode(shingles(tokenize(F.col("text")), _SPAN_N)).alias("g"),
    )
    multi = (
        spans.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g", F.lit(1).alias("is_dup"))
    )
    return (
        spans.join(multi, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("long")
            .alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup",
            F.round(F.col("n_dup") * F.lit(1.0) / F.col("n_spans"), 6).alias(
                "dup_frac"
            ),
        )
    )


@register(
    "q_dsir_weights",
    f"""
    WITH t AS (
      SELECT doc_id, lang, unnest({SQL_TOKS}) AS w FROM documents
    ),
    vocab AS (
      SELECT w,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_t,
             SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS c_r
      FROM t GROUP BY w
    ),
    tot AS (
      SELECT SUM(c_t) AS n_t, SUM(c_r) AS n_r, COUNT(*) AS v FROM vocab
    ),
    lr AS (
      SELECT w, ln((c_t + 1.0) / (n_t + v)) - ln((c_r + 1.0) / (n_r + v))
               AS llr
      FROM vocab CROSS JOIN tot
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(SUM(lr.llr) / COUNT(*), 6) AS dsir_logweight
    FROM t JOIN lr USING (w)
    GROUP BY t.doc_id
    """,
)
def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (hashed-ngram form reduced to unigrams):
    target distribution = the 'en' slice, raw = everything else;
    per-token log-likelihood ratio under add-1 smoothing over the shared
    vocabulary, averaged over each document's token instances — the
    resampling weight that tilts a raw crawl toward a target domain.
    Spark shape: token explode → vocab agg (token-keyed, map-side
    combined) → one-row totals cross-joined in → token-keyed join back →
    doc-keyed mean. The vocab table stays distributed (a web corpus's
    vocabulary is 10^8+) — nothing is collected or broadcast."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("w")
    )
    vocab = toks.groupBy("w").agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("c_t"),
        F.sum((F.col("lang") != "en").cast("long")).alias("c_r"),
    )
    tot = vocab.agg(
        F.sum("c_t").alias("n_t"),
        F.sum("c_r").alias("n_r"),
        F.count(F.lit(1)).alias("v"),
    )
    lr = vocab.crossJoin(F.broadcast(tot)).select(
        "w",
        (
            F.log((F.col("c_t") + 1.0) / (F.col("n_t") + F.col("v")))
            - F.log((F.col("c_r") + 1.0) / (F.col("n_r") + F.col("v")))
        ).alias("llr"),
    )
    return (
        toks.join(lr, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("llr") / F.count(F.lit(1)), 6).alias(
                "dsir_logweight"
            ),
        )
    )


@register(
    "q_pq_adc_topk",
    """
    WITH vec AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (SELECT len(v) AS dim FROM vec LIMIT 1),
    seeds AS (
      SELECT vec_id AS sid, v AS sv FROM vec WHERE vec_id < 4
    ),
    blocks AS (
      SELECT vec.vec_id, b.b, s.sid,
             round(list_sum(list_transform(
               range(1, dims.dim // 4 + 1),
               j -> (vec.v[b.b * (dims.dim // 4) + j]
                     - s.sv[b.b * (dims.dim // 4) + j])
                  * (vec.v[b.b * (dims.dim // 4) + j]
                     - s.sv[b.b * (dims.dim // 4) + j])
             )), 6) AS d2
      FROM vec
      CROSS JOIN dims
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) b
      CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, b, sid FROM (
        SELECT vec_id, b, sid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, b
                                  ORDER BY d2, sid) AS rk
        FROM blocks
      ) WHERE rk = 1
    ),
    qd AS (SELECT b, sid, d2 FROM blocks WHERE vec_id = 0),
    adc AS (
      SELECT best.vec_id, round(SUM(qd.d2), 6) AS adc_d2
      FROM best JOIN qd ON qd.b = best.b AND qd.sid = best.sid
      GROUP BY best.vec_id
    )
    SELECT vec_id, adc_d2 FROM adc ORDER BY adc_d2, vec_id LIMIT 10
    """,
)
def q_pq_adc_topk(spark, sf_dir):
    """PQ asymmetric-distance top-k: the search half of q_pq_encode
    (registry_ext22 — same deterministic sub-centroids: seeds 0..3,
    4 blocks of dim/4). The query (vec_id 0's embedding) precomputes its
    (block, code) → d2 table on the driver — m × ks = 16 floats — which
    rides as literals; each corpus vector's ADC distance is then 4 array
    lookups over its code array + a sum, and the top-10 is
    orderBy(...).limit(10) → TakeOrderedAndProject (distributed partial
    top-k, no global sort). This literal-lookup scan is why PQ search
    over 10^9 vectors is a pure map stage + top-k reduce at scale."""
    from arrow_supercluster_spark.plans.registry_ext22 import (
        _PQ_KS,
        _PQ_M,
        q_pq_encode,
    )

    emb = _emb(spark, sf_dir)
    seeds = sorted(
        emb.filter(F.col("vec_id") < _PQ_KS)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .collect(),
        key=lambda r: r.vec_id,
    )
    dim = len(seeds[0].v)
    blk = dim // _PQ_M
    q = seeds[0].v  # query = vec_id 0 (also seed 0)
    # (block, sid) → rounded squared distance, matching the oracle's
    # rounded per-block d2 (and Spark block_d2's HALF_UP at 6 digits)
    qd2 = [
        [
            round(
                sum(
                    (q[b * blk + j] - s.v[b * blk + j]) ** 2
                    for j in range(blk)
                ),
                6,
            )
            for s in seeds
        ]
        for b in range(_PQ_M)
    ]
    codes = q_pq_encode(spark, sf_dir).select("vec_id", "codes")
    adc = F.round(
        sum(
            F.element_at(
                F.array(*[F.lit(float(d)) for d in qd2[b]]),
                (F.element_at("codes", b + 1) + 1).cast("int"),
            )
            for b in range(_PQ_M)
        ),
        6,
    )
    return (
        codes.select("vec_id", adc.alias("adc_d2"))
        .orderBy("adc_d2", "vec_id")
        .limit(10)
    )
