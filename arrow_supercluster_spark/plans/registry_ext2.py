"""Registry entries: sources/sinks (S3-S4), sessionization, multimodal
plumbing, embedding near-dup — completing SURVEY §2's inventory."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import multimodal, similarity
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import (
    LCG_A,
    LCG_M,
    SQL_POINTS_NONULL,
)
from arrow_supercluster_spark.sources.tables import read_events


# ===========================================================================
# S4 — deterministic synthetic point generator
# ===========================================================================

_N_SYNTH = 2000

@register(
    "q_synthetic_points",
    f"""
    SELECT i AS id,
           -180.0 + 360.0 * ((((i + 1) * {LCG_A}) % {LCG_M}) / {float(LCG_M)!r}) AS lng,
           -85.0 + 170.0 * (((((i + 1) * {LCG_A}) % {LCG_M}) * {LCG_A} % {LCG_M}) / {float(LCG_M)!r}) AS lat
    FROM range({_N_SYNTH}) t(i)
    """,
)
def q_synthetic_points(spark, sf_dir):
    """S4 — seeded synthetic point generator
    (generate-geoparquet.ts:85-139, test-utils.ts:51-65): LCG
    x·16807 mod 2³¹−1, reproducible independent of partitioning (pure
    function of the range index — never rand())."""
    base = spark.range(_N_SYNTH)
    x1 = ((F.col("id") + 1) * LCG_A) % LCG_M
    x2 = (x1 * LCG_A) % LCG_M
    return base.select(
        F.col("id"),
        (F.lit(-180.0) + F.lit(360.0) * (x1 / F.lit(float(LCG_M)))).alias("lng"),
        (F.lit(-85.0) + F.lit(170.0) * (x2 / F.lit(float(LCG_M)))).alias("lat"),
    )


# ===========================================================================
# S3 — GeoParquet sink round-trip
# ===========================================================================

@register(
    "q_roundtrip_points",
    f"SELECT id, lng, lat FROM ({SQL_POINTS_NONULL}) WHERE id % 5 = 0",
)
def q_roundtrip_points(spark, sf_dir):
    """S3 — GeoParquet sink (generate-geoparquet.ts:167-199): write points
    as ZSTD parquet with struct geometry + `geo` footer metadata, read
    back, unpack (P1). Doubles round-trip bit-exactly through parquet, so
    this is oracle-checkable against the source expression."""
    from arrow_supercluster_spark.sources.geoparquet import (
        read_geoparquet,
        write_geoparquet,
    )
    from arrow_supercluster_spark.sources.points import derived_points

    pts = (
        derived_points(spark, sf_dir, with_nulls=False)
        .filter(F.col("id") % 5 == 0)
        .select("id", "lng", "lat")
    )
    path = tempfile.mkdtemp(prefix="geoparquet_rt_") + "/pts"
    write_geoparquet(pts, path)
    return read_geoparquet(spark, path).select("id", "lng", "lat")


# ===========================================================================
# E6b — sessionization (gap-based session windows, batch form)
# ===========================================================================

_GAP_MIN = 30

@register(
    "q_sessionize",
    f"""
    WITH marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > {_GAP_MIN * 60 * 1000000}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, session_no,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           round(SUM(value), 4) AS sum_value
    FROM sess GROUP BY user_id, session_no
    """,
)
def q_sessionize(spark, sf_dir):
    """E6 — gap-based sessionization (30-min inactivity): the batch form of
    streaming/events.sessionize, expressed as lag+cumsum windows so the
    DuckDB oracle can replicate it exactly. At scale this is one shuffle on
    user_id; the streaming form uses native session_window + watermark."""
    from pyspark.sql.window import Window

    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
            > _GAP_MIN * 60 * 1_000_000,
            1,
        ).otherwise(0),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("session_no", F.sum("new_session").over(w2))
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


# ===========================================================================
# Multimodal plumbing
# ===========================================================================

@register(
    "q_multimodal_meta",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Multimodal — typed metadata over opaque binary payload columns
    (payload pruned away by Catalyst when only metadata is selected)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.documents_as_media(docs)
    return media.select("media_id", "kind", "n_bytes")


@register("q_multimodal_features", None)
def q_multimodal_features(spark, sf_dir):
    """Multimodal — mapInPandas feature extraction over binary payloads
    (rows-only: byte-histogram featurizer — format-agnostic content
    features; REAL decodes are the six from-scratch codecs behind the
    q_image_features_*/q_audio_* entries). Verifies the Arrow-batch
    plumbing: schema, batching, array<float> output."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = multimodal.documents_as_media(docs)
    return multimodal.extract_features(media)


# ===========================================================================
# E2 — embedding-cosine near-dup pairs
# ===========================================================================

# the synthetic embeddings are near-orthogonal (max pairwise cos ~0.51),
# so the textbook 0.9 threshold is a trivial empty match; 0.45 keeps a
# small true pair set to verify
_NEARDUP_T = 0.45

@register(
    "q_embedding_neardup",
    f"""
    SELECT a_id, b_id, cos FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(CASE WHEN sqrt(list_inner_product(a.v, a.v))
                             * sqrt(list_inner_product(b.v, b.v)) = 0
                        THEN 0.0
                        ELSE list_inner_product(a.v, b.v)
                             / (sqrt(list_inner_product(a.v, a.v))
                                * sqrt(list_inner_product(b.v, b.v))) END, 6) AS cos
      FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) a
      JOIN (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) b
        ON a.vec_id < b.vec_id
    ) s
    WHERE cos >= {_NEARDUP_T}
    """,
)
def q_embedding_neardup(spark, sf_dir):
    """E2 — embedding-cosine near-duplicate pairs (cos ≥ 0.45; see threshold note). Exact
    all-pairs form for the oracle, executed through the BLAS pair
    kernel since r7 (cosine_pairs_gemm: one matmul per Arrow batch vs
    the broadcast normalized matrix — ~17x over the per-row HOF join
    at sf0.1, equal up to round-6); at 100 TB the LSH-bucketed variant
    (cosine_topk_lsh's bucketing) prunes the pair space first."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return similarity.cosine_pairs_gemm(emb, _NEARDUP_T)


# ===========================================================================
# A1 faithful greedy (rows-only; golden-parity tested in tests/test_greedy.py)
# ===========================================================================

@register("q_cluster_greedy", None)
def q_cluster_greedy(spark, sf_dir):
    """A1 variant (a) — faithful greedy hierarchical clustering
    (arrow-cluster-engine.ts:354-416), exact sequential mode: bit-faithful
    to the single-threaded reference (insertion-order scan, f32 coords,
    weighted centroids, (origin<<5)+(zoom+1)+total id packing). Rows-only
    at the driver; strongly checked in-repo against an independent naive
    oracle (tests/test_greedy.py)."""
    from arrow_supercluster_spark.operators.greedy import greedy_hierarchy
    from arrow_supercluster_spark.sources.points import derived_points

    return greedy_hierarchy(derived_points(spark, sf_dir), mode="exact")


@register("q_cluster_greedy_cc", None)
def q_cluster_greedy_cc(spark, sf_dir):
    """A1 exact DISTRIBUTED greedy (SURVEY §7 Phase 4): per-level
    dependency-closure components (the adaptive form of halo exchange —
    see operators/greedy.py module doc), bit-identical to mode="exact"
    and partition-invariant; golden-parity tested in
    tests/test_greedy_cc.py. Rows-only at the driver (float-sensitive
    hierarchy table, same reason as q_cluster_greedy)."""
    from arrow_supercluster_spark.operators.greedy import greedy_hierarchy
    from arrow_supercluster_spark.sources.points import derived_points

    return greedy_hierarchy(derived_points(spark, sf_dir), mode="cc")


@register("q_cluster_greedy_partitioned", None)
def q_cluster_greedy_partitioned(spark, sf_dir):
    """A1 scale path — greedy within coarse spatial partitions (cell walls
    bound clusters; deterministic, partition-count invariant)."""
    from arrow_supercluster_spark.operators.greedy import greedy_hierarchy
    from arrow_supercluster_spark.sources.points import derived_points

    return greedy_hierarchy(
        derived_points(spark, sf_dir), mode="partitioned", partition_zoom=3
    )
