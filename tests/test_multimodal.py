"""Multimodal plumbing checks against in-repo pandas references: the
Spark-side schema/batching is real even though decode is stubbed (no
media libraries in the container)."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    documents_as_media,
    extract_features,
    frame_sample,
)


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return documents_as_media(docs.limit(60))


def test_extract_features_matches_reference(spark, sf_dir):
    media = _media(spark, sf_dir)
    got = {r.media_id: r.feature for r in extract_features(media).collect()}
    for r in media.collect():
        want = decode_image(bytes(r.payload), fake=True)
        assert len(got[r.media_id]) == FEATURE_DIM
        assert got[r.media_id] == [float(x) for x in want]


def test_frame_sample_matches_reference(spark, sf_dir):
    media = _media(spark, sf_dir)
    got = {
        (r.media_id, r.frame_idx): bytes(r.frame)
        for r in frame_sample(media, frame_bytes=64, stride=2).collect()
    }
    want = {}
    for r in media.filter(F.col("kind") == "video").collect():
        p = bytes(r.payload)
        for i in range(0, len(p) // 64, 2):
            want[(r.media_id, i)] = p[i * 64 : (i + 1) * 64]
    assert got == want and len(want) > 0


def test_frame_sample_filters_before_python(spark, sf_dir):
    """The kind filter must reach the scan, not run inside Python."""
    plan = frame_sample(_media(spark, sf_dir))._jdf.queryExecution().executedPlan().toString()
    fi = plan.index("Filter")
    mi = plan.index("MapInPandas")
    assert mi < fi, "filter must be below (after in print order) the Python map"
