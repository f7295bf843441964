"""Round-2 registry additions: training-data pipeline composition
(operators/pipeline.py) — deterministic hash sampling, token-budget shard
packing, corpus curation. All fully oracle-checked (value hash): the
hash is portable BIGINT arithmetic, packing is a windowed running sum,
and curation composes the already-proven md5-dedup / quality / lang-id
kernels.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import pipeline, textops
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import (
    _SQL_LANG_CASE,
    _SQL_LANG_SCORES,
    SQL_NORM,
    SQL_TOKS,
    _docs,
)

_RATE = 0.1
_THRESH = int(_RATE * pipeline.HASH_MOD)
_BUDGET = 512
_SUBSTREAMS = 2
_SLIST = ", ".join(f"s_{l}" for l in sorted(textops.STOPWORDS))

# per-doc (lang, token-count) derivation shared by both oracle queries
_SQL_DOC_LANG_TOKS = f"""
    SELECT doc_id, n, {_SQL_LANG_CASE} AS lang FROM (
      SELECT doc_id, n, {_SLIST}, greatest({_SLIST}) AS best FROM (
        SELECT doc_id, len({SQL_TOKS}) AS n, {_SQL_LANG_SCORES} FROM {{src}}
      ) t0
    ) t1
"""


@register(
    "q_sample_hash",
    f"""
    SELECT doc_id FROM documents
    WHERE (doc_id * {pipeline.HASH_MULT}) % {pipeline.HASH_MOD} < {_THRESH}
    """,
)
def q_sample_hash(spark, sf_dir):
    """Pipeline — deterministic keyed sampling (~10%): a Lehmer-style
    multiplicative hash in plain BIGINT arithmetic, so membership is
    reproducible across engines, runs, and partitionings (rand()-based
    sampling is none of those). Narrow filter — no shuffle, no RNG
    state."""
    return pipeline.hash_sample(_docs(spark, sf_dir), "doc_id", _RATE).select(
        "doc_id"
    )


@register(
    "q_token_shards",
    f"""
    WITH langd AS ({_SQL_DOC_LANG_TOKS.format(src="documents")}),
    packed AS (
      SELECT lang, doc_id % {_SUBSTREAMS} AS substream, n,
             COALESCE(SUM(n) OVER (
               PARTITION BY lang, doc_id % {_SUBSTREAMS} ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM langd
    )
    SELECT lang, substream,
           CAST(floor(prev / {float(_BUDGET)!r}) AS BIGINT) AS shard,
           COUNT(*) AS n_docs, SUM(n) AS n_tokens
    FROM packed GROUP BY 1, 2, 3
    """,
)
def q_token_shards(spark, sf_dir):
    """Pipeline — first-fit token-budget shard packing per (lang,
    substream): the deterministic streaming-writer rule as a windowed
    running sum. Sub-sharding bounds reducer skew (a language is never a
    single reducer at 100 TB)."""
    return pipeline.token_shards(
        _docs(spark, sf_dir), budget=_BUDGET, substreams=_SUBSTREAMS
    )


@register(
    "q_corpus_curation",
    f"""
    WITH keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5({SQL_NORM})
    ),
    kept AS (
      SELECT d.doc_id, d.text FROM documents d JOIN keepers USING (doc_id)
    ),
    quality AS (
      SELECT doc_id,
             (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.5 END)
             * (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.6 END)
             * (CASE WHEN ur <= 0.3 THEN 1.0 ELSE 0.7 END) AS q
      FROM (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE)
                 / greatest(CAST(len({SQL_TOKS}) AS DOUBLE), 1.0) AS mwl,
               CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                 / greatest(CAST(length(text) AS DOUBLE), 1.0) AS pr,
               CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
                 / greatest(CAST(length(text) AS DOUBLE), 1.0) AS ur
        FROM kept
      ) f
    ),
    langd AS ({_SQL_DOC_LANG_TOKS.format(src="kept")})
    SELECT l.lang, COUNT(*) AS n_docs, SUM(l.n) AS n_tokens
    FROM langd l JOIN quality USING (doc_id)
    WHERE quality.q >= 0.5
    GROUP BY 1
    """,
)
def q_corpus_curation(spark, sf_dir):
    """Pipeline — composed curation pass (exact-dedup keeper → quality
    floor → per-lang totals): the end-to-end pretraining corpus build as
    ONE declarative plan; digests (never text) cross the dedup shuffle."""
    return pipeline.curate_corpus(_docs(spark, sf_dir), min_quality=0.5)


@register(
    "q_range_join",
    """
    WITH ivals AS (
      SELECT event_id AS interval_id, ts AS ival_start,
             ts + INTERVAL 30 MINUTE AS ival_end
      FROM events WHERE event_id % 97 = 0
    )
    SELECT i.interval_id, COUNT(*) AS n_events,
           round(SUM(e.value), 4) AS sum_value
    FROM events e
    JOIN ivals i ON e.ts >= i.ival_start AND e.ts <= i.ival_end
    GROUP BY 1
    """,
)
def q_range_join(spark, sf_dir):
    """Range join (brief's custom-operator list): events matched to the
    30-minute intervals containing them via the bin-bucketed
    interval_join (operators/asof.py) — equi-join on time bins + exact
    BETWEEN refine, never a nested loop. The DuckDB oracle uses the naive
    BETWEEN join, so the binning is differentially checked."""
    from arrow_supercluster_spark.operators.asof import interval_join
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    ivals = ev.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("ival_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("ival_end"),
    )
    joined = interval_join(
        ev.select("ts", "value"), ivals, ts="ts", start="ival_start", end="ival_end"
    )
    return joined.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@register("q_multimodal_frames", None)
def q_multimodal_frames(spark, sf_dir):
    """Multimodal — video frame sampling (every 4th 256-byte frame as its
    own row): the one-to-many mapInPandas plumbing real frame extraction
    uses (brief's decode/extract/resize/frame-sample list). Rows-only
    (binary payloads); sliced-frame correctness is pinned by an in-repo
    pandas-reference test."""
    from arrow_supercluster_spark.operators.multimodal import (
        documents_as_media,
        frame_sample,
    )

    media = documents_as_media(_docs(spark, sf_dir))
    out = frame_sample(media)
    return out.select(
        "media_id", "frame_idx", F.length("frame").alias("frame_bytes")
    )


_IVF_PATH = f"/tmp/ascs_ivf_index_{os.getpid()}"  # pid-scoped: see registry_ext7.GREEDY_PATH
_IVF_SF: str | None = None


@register("q_ann_ivf_indexed", None)
def q_ann_ivf_indexed(spark, sf_dir):
    """E3 — ANN over the PERSISTED IVF index (list_id-partitioned parquet
    + centroid table): probes restrict the scan to nprobe partitions via
    dynamic partition pruning (asserted in tests/test_plans.py /
    test_similarity.py). Rows-only (k-means assignment is
    float-iterative); self-query rank-1 identity and rank ordering are
    pinned in tests."""
    global _IVF_SF
    from arrow_supercluster_spark.operators.similarity import (
        ivf_topk_indexed,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if _IVF_SF != sf_dir:
        ivf_write_index(emb, _IVF_PATH, n_lists=8)
        _IVF_SF = sf_dir
    queries = emb.limit(8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding")
    )
    return ivf_topk_indexed(spark, _IVF_PATH, queries, k=5, nprobe=2)


_MIX_RATES = {f"src{i}": (0.2 if i % 2 == 0 else 0.05) for i in range(20)}
_SQL_MIX_CASE = (
    "CASE source "
    + " ".join(
        f"WHEN '{s}' THEN {int(r * pipeline.HASH_MOD)}"
        for s, r in sorted(_MIX_RATES.items())
    )
    + " ELSE 0 END"
)


@register(
    "q_mixture_sample",
    f"""
    SELECT doc_id, source FROM documents
    WHERE (doc_id * {pipeline.HASH_MULT}) % {pipeline.HASH_MOD}
          < {_SQL_MIX_CASE}
    """,
)
def q_mixture_sample(spark, sf_dir):
    """Pipeline — domain-mixture sampling: even-numbered sources keep
    ~20%, odd ~5% (the pretraining data-mixing primitive). One narrow
    deterministic filter; membership reproducible across engines."""
    return pipeline.mixture_sample(_docs(spark, sf_dir), _MIX_RATES).select(
        "doc_id", "source"
    )


@register(
    "q_shard_payloads",
    f"""
    WITH langd AS ({_SQL_DOC_LANG_TOKS.format(src="documents")}),
    packed AS (
      SELECT d.doc_id, d.text, l.lang, l.n,
             d.doc_id % {_SUBSTREAMS} AS substream,
             COALESCE(SUM(l.n) OVER (
               PARTITION BY l.lang, d.doc_id % {_SUBSTREAMS} ORDER BY d.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM documents d JOIN langd l USING (doc_id)
    )
    SELECT lang, substream,
           CAST(floor(prev / {float(_BUDGET)!r}) AS BIGINT) AS shard,
           COUNT(*) AS n_docs, SUM(n) AS n_tokens,
           string_agg(text, chr(10) ORDER BY doc_id) AS payload
    FROM packed GROUP BY 1, 2, 3
    """,
)
def q_shard_payloads(spark, sf_dir):
    """Pipeline — materialized training shards: per (lang, substream,
    shard) the documents concatenated in key order, the actual sequence a
    trainer reads. Deterministic under any partitioning (collected
    structs are sorted before joining)."""
    return pipeline.shard_payloads(
        _docs(spark, sf_dir), budget=_BUDGET, substreams=_SUBSTREAMS
    )
