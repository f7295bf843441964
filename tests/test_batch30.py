"""Batch-30 tests: binaryFile ingestion ≡ in-flight decode; streaming
trending counts + finisher ≡ batch top-k."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import multimodal as mm
from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.streaming.events import (
    finish_trending_topk,
    trending_counts,
)


def test_binary_ingest_matches_inflight(spark, sf_dir, tmp_path_factory):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path_factory.mktemp("media")) + "/bmp"
    n = mm.write_media_files(docs, path)
    assert n == docs.count()
    via_files = {
        r.media_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b)
        for r in mm.image_features(mm.read_media_files(spark, path)).collect()
    }
    inflight = {
        r.media_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b)
        for r in mm.image_features(mm.documents_as_textured_images(docs)).collect()
    }
    assert via_files == inflight


def test_streaming_trending_matches_batch(spark, sf_dir, tmp_path_factory):
    from arrow_supercluster_spark.sources.tables import read_events

    # materialize normalized events once, stream them file-by-file
    src = str(tmp_path_factory.mktemp("trend_src"))
    read_events(spark, sf_dir).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    ckpt = str(tmp_path_factory.mktemp("trend_ckpt"))
    q = (
        trending_counts(stream)
        .writeStream.format("memory")
        .queryName("trend_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = finish_trending_topk(spark.table("trend_counts"), k=3)
    got = {(r.hour, r.event_type, r.n, r.rk) for r in streamed.collect()}
    expected = {
        (r.hour, r.event_type, r.n, r.rk)
        for r in REGISTRY["q_trending_topk"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected
