"""Round-2 registry additions, batch 10 — curation COMPOSITIONS: the
multi-operator verdicts real pipelines ship (best-keeper dedup,
keep/drop verdicts with reasons, chunk-level dedup). Each composes
operators that are individually oracle-checked elsewhere; the
composition itself gets its own differential twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import normalize_text
from arrow_supercluster_spark.operators.textops import quality_score
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_NORM, SQL_TOKS, _docs
from arrow_supercluster_spark.sources.points import SQL_POINTS

_SQL_QUALITY = f"""
    (CASE WHEN CAST(length(text) AS DOUBLE)
               / greatest(CAST(len({SQL_TOKS}) AS DOUBLE), 1.0)
               BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)
    * (CASE WHEN CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                 / greatest(CAST(length(text) AS DOUBLE), 1.0) <= 0.2
            THEN 1.0 ELSE 0.6 END)
    * (CASE WHEN CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
                 / greatest(CAST(length(text) AS DOUBLE), 1.0) <= 0.3
            THEN 1.0 ELSE 0.7 END)
"""


@register(
    "q_dedup_best_keeper",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, source,
             md5({SQL_NORM}) AS h,
             round({_SQL_QUALITY}, 6) AS q
      FROM documents
    )
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY h
                                ORDER BY q DESC, doc_id) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def q_dedup_best_keeper(spark, sf_dir):
    """E1 composition — QUALITY-keeper dedup: within each exact-dup
    group keep the highest-quality copy (ties → lowest id), not the
    arbitrary min-id copy — what production curation actually does
    (copies differ in trailing boilerplate/casing after normalization).
    One agg keyed by text digest keeping max(struct(q, -id)); the
    winner set comes back as a semi-join (no forced broadcast — winners
    are one row per distinct text, unbounded at corpus scale; the
    planner's autoBroadcastJoinThreshold decides, same as
    dedup.exact_dedup). The corpus text never shuffles — digests and
    (q, id) pairs do."""
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        F.md5(normalize_text(F.col("text"))).alias("h"),
        F.round(quality_score(F.col("text")), 6).alias("q"),
    )
    winners = (
        scored.groupBy("h")
        .agg(F.max(F.struct(F.col("q"), (-F.col("doc_id")).alias("neg_id"))).alias("w"))
        .select((-F.col("w.neg_id")).alias("doc_id"))
    )
    return docs.join(winners, "doc_id", "leftsemi").select(
        "doc_id", "lang", "source"
    )


@register(
    "q_curation_verdict",
    f"""
    WITH scored AS (
      SELECT doc_id,
             round({_SQL_QUALITY}, 6) AS q,
             len({SQL_TOKS}) AS n_toks,
             md5({SQL_NORM}) AS h,
             doc_id = (MIN(doc_id) OVER (PARTITION BY md5({SQL_NORM})))
               AS is_keeper
      FROM documents
    )
    SELECT doc_id,
           (is_keeper AND q >= 0.5 AND n_toks BETWEEN 10 AND 10000)
             AS keep,
           CASE WHEN NOT is_keeper THEN 'duplicate'
                WHEN q < 0.5 THEN 'low_quality'
                WHEN n_toks < 10 THEN 'too_short'
                WHEN n_toks > 10000 THEN 'too_long'
                ELSE 'ok' END AS reason
    FROM scored
    """,
)
def q_curation_verdict(spark, sf_dir):
    """Pipeline composition — per-document keep/drop VERDICT with the
    firing reason (priority order: duplicate → low_quality → length),
    the audit artifact every curation run must emit so drops are
    explainable. Dedup keeper-ship, quality, and token length compose
    in one pass: a window over the text digest (bounded by dup-group
    size) plus narrow scoring — no second scan, no join."""
    from pyspark.sql.window import Window as W

    from arrow_supercluster_spark.operators.textops import token_count

    docs = _docs(spark, sf_dir)
    toks = token_count(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("q"),
        toks.alias("n_toks"),
        F.md5(normalize_text(F.col("text"))).alias("h"),
    ).withColumn(
        "is_keeper",
        F.col("doc_id") == F.min("doc_id").over(W.partitionBy("h")),
    )
    keep = (
        F.col("is_keeper")
        & (F.col("q") >= 0.5)
        & F.col("n_toks").between(10, 10000)
    )
    reason = (
        F.when(~F.col("is_keeper"), "duplicate")
        .when(F.col("q") < 0.5, "low_quality")
        .when(F.col("n_toks") < 10, "too_short")
        .when(F.col("n_toks") > 10000, "too_long")
        .otherwise("ok")
    )
    return scored.select("doc_id", keep.alias("keep"), reason.alias("reason"))


_CH, _ST = 200, 150


@register(
    "q_chunk_dedup",
    f"""
    WITH chunks AS (
      SELECT doc_id, i AS chunk_idx,
             md5(substr(text, CAST(i * {_ST} + 1 AS BIGINT), {_CH})) AS ch
      FROM documents,
           unnest(generate_series(0,
             CAST(floor((length(text) - 1) / {_ST}) AS BIGINT))) AS t(i)
    )
    SELECT doc_id, chunk_idx FROM (
      SELECT doc_id, chunk_idx,
             ROW_NUMBER() OVER (PARTITION BY ch
                                ORDER BY doc_id, chunk_idx) AS rk
      FROM chunks
    ) WHERE rk = 1
    """,
)
def q_chunk_dedup(spark, sf_dir):
    """Pipeline composition — CHUNK-level dedup (the RAG-store/context-
    window granularity: two docs sharing a boilerplate paragraph keep
    one copy of that chunk): chunk with the q_doc_chunks windows, hash
    each chunk, keep the first (doc_id, chunk_idx) per digest. The
    chunk generator is narrow; the keeper choice is one agg keyed by
    chunk digest carrying only (digest, ids) — chunk text never
    shuffles."""
    docs = _docs(spark, sf_dir)
    n = F.length("text")
    # filter empty docs BEFORE the generator: Spark's sequence(0, -1)
    # auto-steps backwards to [0, -1] (phantom chunks) where DuckDB's
    # generate_series(0, -1) is empty
    docs = docs.filter(n > 0)
    idx = F.explode(
        F.sequence(F.lit(0), F.floor((n - 1) / _ST).cast("long"))
    ).alias("chunk_idx")
    chunks = docs.select("doc_id", "text", idx).select(
        "doc_id",
        "chunk_idx",
        F.md5(
            F.col("text").substr(F.col("chunk_idx") * _ST + 1, F.lit(_CH))
        ).alias("ch"),
    )
    winners = (
        chunks.groupBy("ch")
        .agg(F.min(F.struct("doc_id", "chunk_idx")).alias("w"))
        .select(F.col("w.doc_id").alias("doc_id"), F.col("w.chunk_idx").alias("chunk_idx"))
    )
    return winners


_R_EARTH_M = 6371008.8  # IUGG mean Earth radius


@register(
    "q_haversine_segments",
    f"""
    WITH pts AS (
      SELECT id, radians(lng) AS rlng, radians(lat) AS rlat
      FROM ({SQL_POINTS}) WHERE lng IS NOT NULL
    )
    SELECT a.id AS a_id, b.id AS b_id,
           round(2 * {_R_EARTH_M!r} * asin(sqrt(
             pow(sin((b.rlat - a.rlat) / 2), 2)
             + cos(a.rlat) * cos(b.rlat)
               * pow(sin((b.rlng - a.rlng) / 2), 2)
           )), 3) AS dist_m
    FROM pts a JOIN pts b ON b.id = a.id + 1
    """,
)
def q_haversine_segments(spark, sf_dir):
    """Geo extension — great-circle (haversine) distance in meters over
    consecutive point pairs: the metric surface the Mercator-only
    reference lacks (projected distance distorts with latitude; radius
    queries in meters need the sphere). Narrow trig projections + one
    broadcast-able pair equi-join; rounded to mm before hashing
    (transcendental discipline). The same formula drives radius-in-
    meters filters and track-length aggregations at any scale."""
    from arrow_supercluster_spark.sources.points import derived_points

    pts = (
        derived_points(spark, sf_dir)
        .filter(F.col("lng").isNotNull())
        .select(
            "id",
            F.radians("lng").alias("rlng"),
            F.radians("lat").alias("rlat"),
        )
    )
    a = pts.select(
        F.col("id").alias("a_id"),
        F.col("rlng").alias("a_rlng"),
        F.col("rlat").alias("a_rlat"),
    )
    b = pts.select(
        F.col("id").alias("b_id"),
        F.col("rlng").alias("b_rlng"),
        F.col("rlat").alias("b_rlat"),
    )
    h = (
        F.pow(F.sin((F.col("b_rlat") - F.col("a_rlat")) / 2), 2)
        + F.cos(F.col("a_rlat"))
        * F.cos(F.col("b_rlat"))
        * F.pow(F.sin((F.col("b_rlng") - F.col("a_rlng")) / 2), 2)
    )
    dist = 2 * _R_EARTH_M * F.asin(F.sqrt(h))
    return (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .select("a_id", "b_id", F.round(dist, 3).alias("dist_m"))
    )


@register("q_audio_features", None)
def q_audio_features(spark, sf_dir):
    """Multimodal — REAL audio decode: payloads are genuine RIFF/WAVE
    PCM16 files (synthesized per doc id — the container ships no media
    data, but the bytes are playable WAV), decoded by a from-scratch
    chunk-walking parser (numpy only, no external libs — unlike
    image/video, WAV needs none) into rate/duration/RMS/peak/dominant-
    frequency/per-frame energy. Arrow-batched mapInPandas, payload
    pruned after decode. Rows-only: the oracle can't run numpy; the
    in-repo test (tests/test_multimodal.py) checks decoded features
    against the synthesis closed form — a strictly stronger check."""
    from arrow_supercluster_spark.operators.multimodal import (
        audio_features,
        documents_as_audio,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return audio_features(documents_as_audio(docs))


@register("q_image_features", None)
def q_image_features(spark, sf_dir):
    """Multimodal — REAL image decode: payloads are genuine 24-bit BMP
    files (synthesized gradients — the container ships no image data,
    but the bytes open in any viewer), decoded by a from-scratch header
    parser (numpy only — BMP, like WAV, needs no codec) into
    dimensions + per-channel means. With q_audio_features this de-stubs
    two of the three media kinds; only compressed formats (JPEG/PNG/
    video codecs) remain stubbed, honestly, for lack of codec libs.
    Rows-only: numpy can't run in the SQL oracle; the in-repo tests
    check decode/resize against the synthesis closed form."""
    from arrow_supercluster_spark.operators.multimodal import (
        documents_as_images,
        image_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return image_features(documents_as_images(docs))
