"""Round-2 registry additions, batch 3: relevance scoring (BM25), LM
quality scoring (unigram log-prob), stratified quota sampling, value
histograms, a JSONL source/sink round-trip, and CUBE grouping sets.
All oracle-checked; float outputs rounded before hashing.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import pipeline, relevance
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_BM25_TERMS = ["spark", "hash", "vector"]
_BM25_K = 20
_VOCAB = 24  # small enough that the OOV smoothing path is actually exercised
_QUOTA = 25


@register(
    "q_bm25_search",
    relevance.sql_bm25_topk(_BM25_TERMS, _BM25_K, SQL_TOKS),
)
def q_bm25_search(spark, sf_dir):
    """Pipeline — Okapi BM25 keyword relevance, top-20 for a 3-term
    query. The corpus token stream is exploded only onto the query terms
    (postings filter inside the generator projection), document
    frequencies and the (N, avgdl) scalars are broadcast, and the final
    rank is a TakeOrderedAndProject — no full-corpus shuffle."""
    return relevance.bm25_topk(_docs(spark, sf_dir), _BM25_TERMS, k=_BM25_K)


@register(
    "q_unigram_logprob",
    relevance.sql_unigram_logprob(_VOCAB, SQL_TOKS),
)
def q_unigram_logprob(spark, sf_dir):
    """Pipeline — CCNet-style LM quality signal: mean unigram log-prob
    per document under the corpus's own top-V unigram distribution
    (V=24 so out-of-vocabulary smoothing is exercised). One word-count
    agg fits the vocabulary; scoring folds a broadcast token→ln(p) map
    over each document's token array — narrow, no corpus shuffle."""
    return relevance.unigram_logprob(_docs(spark, sf_dir), vocab_size=_VOCAB)


@register(
    "q_stratified_sample",
    pipeline.sql_stratified_sample(_QUOTA, "doc_id, lang, source"),
)
def q_stratified_sample(spark, sf_dir):
    """Pipeline — exact per-language quotas (25 docs/lang) by smallest
    portable hash: the reproducible stratified-sampling primitive
    (sampleBy is rate-based and RNG-seeded — membership changes across
    runs). Two-phase: narrow partition-local top-quota-per-group, then
    the exact rank over ≤ partitions·quota rows, then a broadcast
    semi-join of winner keys — the wide row never shuffles."""
    return pipeline.stratified_sample(_docs(spark, sf_dir), _QUOTA).select(
        "doc_id", "lang", "source"
    )


@register(
    "q_value_histogram",
    """
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
           COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v,
           round(SUM(value), 4) AS sum_v
    FROM events GROUP BY 1
    """,
)
def q_value_histogram(spark, sf_dir):
    """X1 companion — fixed-width histogram binning over events.value:
    the profiling primitive behind every distribution dashboard. One
    partial-agg shuffle keyed by ~20 bins; sums rounded before hashing
    (double addition is order-dependent)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.floor(F.col("value") / 25.0).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.round(F.sum("value"), 4).alias("sum_v"),
    )


@register(
    "q_jsonl_roundtrip",
    """
    SELECT event_id, user_id, event_type, value, props,
           epoch_us(ts) AS ts_us
    FROM events
    """,
)
def q_jsonl_roundtrip(spark, sf_dir):
    """S2 companion — JSON-lines source/sink round-trip (the exchange
    format every labeling/ingest pipeline speaks): write events as JSONL
    with microsecond timestamp fidelity, read back with an explicit
    schema (schema inference on 100 TB is a full extra scan), and prove
    value equality against the parquet original. Doubles survive via
    shortest-round-trip formatting; timestamps via an explicit
    6-fraction-digit format."""
    ts_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    from arrow_supercluster_spark.sources.tables import read_events

    # read_events normalizes every driver-round ts encoding (bigint
    # nanos under the legacy conf, TIMESTAMP_NTZ) to instant-semantics
    # TimestampType — a bare cast here breaks on the nanos rounds
    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "props", "ts"
    )
    path = tempfile.mkdtemp(prefix="jsonl_rt_") + "/events"
    ev.write.mode("overwrite").option("timestampFormat", ts_fmt).json(path)
    back = (
        spark.read.schema(ev.schema)
        .option("timestampFormat", ts_fmt)
        .json(path)
    )
    return back.select(
        "event_id", "user_id", "event_type", "value", "props",
        F.unix_micros("ts").alias("ts_us"),
    )


_PMI_MIN, _PMI_K = 5, 20


@register(
    "q_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, {SQL_TOKS} AS t FROM documents
    ),
    uni AS (
      SELECT tok, COUNT(*) AS c FROM (SELECT unnest(t) AS tok FROM toks)
      GROUP BY 1
    ),
    n_uni AS (SELECT SUM(c) AS n FROM uni),
    bi AS (
      SELECT x, y, COUNT(*) AS c FROM (
        SELECT t[i] AS x, t[i+1] AS y
        FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
      ) GROUP BY 1, 2
    ),
    n_bi AS (SELECT SUM(c) AS n FROM bi)
    SELECT x, y, bi.c AS n_pair,
           round(ln((bi.c / n_bi.n) /
                    ((ux.c / n_uni.n) * (uy.c / n_uni.n))), 6) AS pmi
    FROM bi
    JOIN uni ux ON ux.tok = bi.x
    JOIN uni uy ON uy.tok = bi.y
    CROSS JOIN n_uni CROSS JOIN n_bi
    WHERE bi.c >= {_PMI_MIN}
    ORDER BY pmi DESC, x, y LIMIT {_PMI_K}
    """,
)
def q_collocations(spark, sf_dir):
    """Pipeline — PMI collocation mining (top bigrams by pointwise mutual
    information, the classic phrase-detection statistic): bigram counts
    from a zip-with-shifted-self inside the row (no second explode pass),
    unigram marginals broadcast back onto the pair counts, scalars
    cross-joined as 1-row broadcasts, final top-k a TakeOrdered. PMI is
    rounded before ranking for cross-engine determinism."""
    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir)
    toked = docs.select(tokenize(F.col("text")).alias("t"))
    uni = (
        toked.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    bigrams = toked.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))).alias("x"),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))).alias("y"),
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    bi = bigrams.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_pair"))
    n_bi = bi.agg(F.sum("n_pair").alias("n_bi"))
    ux = uni.select(F.col("tok").alias("x"), F.col("c").alias("cx"))
    uy = uni.select(F.col("tok").alias("y"), F.col("c").alias("cy"))
    pmi = F.round(
        F.log(
            (F.col("n_pair") / F.col("n_bi"))
            / ((F.col("cx") / F.col("n_uni")) * (F.col("cy") / F.col("n_uni")))
        ),
        6,
    )
    return (
        bi.filter(F.col("n_pair") >= _PMI_MIN)
        .join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select("x", "y", "n_pair", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "x", "y")
        .limit(_PMI_K)
    )


@register(
    "q_edit_distance",
    """
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS dist
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def q_edit_distance(spark, sf_dir):
    """Pipeline — Levenshtein edit distance over candidate pairs (the
    exact-verify step after any fuzzy-candidate generator; prefixed to 80
    chars because edit distance is O(m·n) per pair — the bound a real
    pipeline also applies). Adjacent-id pairs stand in for an LSH
    candidate set so the oracle is deterministic. Both engines implement
    the classic dynamic-programming distance, so values match exactly."""
    docs = _docs(spark, sf_dir)
    a = docs.select(F.col("doc_id").alias("a_id"), F.substring("text", 1, 80).alias("a_t"))
    b = docs.select(F.col("doc_id").alias("b_id"), F.substring("text", 1, 80).alias("b_t"))
    return (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .select("a_id", "b_id", F.levenshtein("a_t", "b_t").alias("dist"))
    )


@register(
    "q_group_quantiles",
    """
    SELECT lang,
           round(quantile_cont(n_chars, 0.25), 6) AS p25,
           round(quantile_cont(n_chars, 0.50), 6) AS p50,
           round(quantile_cont(n_chars, 0.90), 6) AS p90,
           COUNT(*) AS n
    FROM documents GROUP BY lang
    """,
)
def q_group_quantiles(spark, sf_dir):
    """X1 companion — exact per-group quantiles (doc-length distribution
    per language): linear-interpolated percentile, the corpus-profiling
    shape behind every length-filter threshold choice. Exact percentile
    shuffles each group's values to one reducer — right for bounded
    group counts like languages; percentile_approx is the unbounded-
    cardinality variant (tested in q_approx_distinct's family)."""
    docs = _docs(spark, sf_dir)
    return docs.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(n_chars, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.90)"), 6).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


_WS_K = 50  # weighted-sample size


@register(
    "q_weighted_sample",
    f"""
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (ORDER BY
               round(-ln((({{m}} * doc_id) % {{mod}} + 1.0) / ({{mod}} + 1.0))
                     / n_chars, 9),
               doc_id) AS _r
      FROM documents
    ) WHERE _r <= {_WS_K}
    """.format(m=pipeline.HASH_MULT, mod=pipeline.HASH_MOD),
)
def q_weighted_sample(spark, sf_dir):
    """Pipeline — weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, public algorithm): k docs drawn with probability
    proportional to n_chars, via key = -ln(u)/w with u a DETERMINISTIC
    hash-derived uniform — reproducible across runs, partitionings, and
    engines, unlike rand()-seeded sampling. Keys are rounded before
    ranking so a 1-ulp libm divergence can't flip the selection at the
    boundary. Global top-k by smallest key = orderBy().limit() →
    TakeOrderedAndProject: each partition keeps its own k candidates,
    the driver merges k·partitions rows — no full sort, no hot reducer."""
    docs = _docs(spark, sf_dir)
    u = (
        F.pmod(F.col("doc_id") * pipeline.HASH_MULT, F.lit(pipeline.HASH_MOD))
        + 1.0
    ) / float(pipeline.HASH_MOD + 1)
    key = F.round(-F.log(u) / F.col("n_chars"), 9)
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("_key"))
        .orderBy("_key", "doc_id")
        .limit(_WS_K)
        .select("doc_id", "lang", "n_chars")
    )


_CHUNK, _STRIDE = 200, 150  # 50-char overlap


@register(
    "q_doc_chunks",
    f"""
    SELECT doc_id, i AS chunk_idx,
           substr(text, CAST(i * {_STRIDE} + 1 AS BIGINT), {_CHUNK}) AS chunk
    FROM documents,
         unnest(generate_series(0,
           CAST(floor((length(text) - 1) / {_STRIDE}) AS BIGINT))) AS t(i)
    """,
)
def q_doc_chunks(spark, sf_dir):
    """Pipeline — fixed-window document chunking with overlap (the RAG /
    context-window prep primitive): 200-char chunks on a 150-char stride.
    A narrow generator projection — sequence+explode inside the row, no
    shuffle, no UDF; chunk count derives from length() so the plan
    needs no second scan."""
    docs = _docs(spark, sf_dir)
    n = F.length("text")
    # empty docs produce NO chunks: Spark's sequence(0, -1) would
    # auto-step backwards to [0, -1] where DuckDB's generate_series is
    # empty — filter before the generator (same guard as q_chunk_dedup)
    docs = docs.filter(n > 0)
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((n - 1) / _STRIDE).cast("long"))
    ).alias("chunk_idx")
    return docs.select("doc_id", "text", idx).select(
        "doc_id",
        "chunk_idx",
        F.col("text")
        .substr(F.col("chunk_idx") * _STRIDE + 1, F.lit(_CHUNK))
        .alias("chunk"),
    )


@register(
    "q_inverted_index",
    f"""
    SELECT tok, array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS docs,
           COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents)
    GROUP BY tok
    """,
)
def q_inverted_index(spark, sf_dir):
    """Pipeline — inverted index build (token → sorted posting list +
    document frequency), the batch side of any search/retrieval system.
    One token-keyed agg with map-side partials; postings travel as doc-id
    sets, never text. At 100 TB, head tokens' lists get long — the
    production layout shards postings by (token, doc_id range) buckets;
    the relational kernel here is the per-bucket unit of that layout.
    The posting list travels as a comma-joined string: the driver's
    pandas canonicalizer cannot hash list cells (CORRECTNESS_r10 err;
    VERDICT r10 #1)."""
    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir)
    return (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("docs"))
        # df from the posting array itself — a count_distinct agg would
        # force a second Expand+Exchange for the same number
        .select(
            "tok",
            F.array_join(
                F.transform("docs", lambda x: x.cast("string")), ","
            ).alias("docs"),
            F.size("docs").alias("df"),
        )
    )


@register(
    "q_csv_roundtrip",
    """
    SELECT event_id, user_id, event_type, value, props,
           epoch_us(ts) AS ts_us
    FROM events
    """,
)
def q_csv_roundtrip(spark, sf_dir):
    """S2 companion — CSV source/sink round-trip, completing the format
    matrix (parquet, Arrow IPC, GeoParquet, JSONL, CSV). Timestamps ride
    as epoch-microsecond longs (CSV has no timestamp type worth trusting
    across writers); doubles survive via Java's shortest-round-trip
    formatting; props (JSON-in-string with quotes/commas) exercises RFC
    4180 quoting. Read back with an explicit schema — inference is a
    second full scan and types drift."""
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "props",
        F.unix_micros("ts").alias("ts_us"),
    )
    path = tempfile.mkdtemp(prefix="csv_rt_") + "/events"
    ev.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(ev.schema).option("header", "true").csv(path)


@register(
    "q_cube_agg",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n, round(SUM(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_agg(spark, sf_dir):
    """Grouping-sets coverage beyond ROLLUP: full CUBE over orders —
    all four grouping combinations in one partial-agg pass (Spark
    expands grouping sets before the single shuffle)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "sum_price",
        )
    )
