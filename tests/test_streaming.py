"""Structured Streaming tests: the streaming tumbling-window aggregate must
match the batch q_event_windows on the same data (fed through a file
stream, complete mode to a memory sink)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import pandas as pd
import pytest

from arrow_supercluster_spark.sources.tables import read_events
from arrow_supercluster_spark.streaming.events import hourly_event_windows, sessionize


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, tmp_path_factory):
    # re-write events as a clean micro-batch source (nanos ts normalized)
    src = str(tmp_path_factory.mktemp("events_src"))
    ev = read_events(spark, sf_dir)
    ev.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(ev.schema).parquet(src)


def test_streaming_matches_batch_windows(spark, sf_dir, events_stream):
    q = (
        hourly_event_windows(events_stream)
        .writeStream.format("memory")
        .queryName("hourly_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from hourly_agg").toPandas()

    ev = read_events(spark, sf_dir)
    from pyspark.sql import functions as F

    want = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .toPandas()
    )
    g = got.sort_values("hour").reset_index(drop=True)
    w = want.sort_values("hour").reset_index(drop=True)
    g["sum_value"] = g["sum_value"].round(4)
    w["sum_value"] = w["sum_value"].round(4)
    pd.testing.assert_frame_equal(g, w)


def test_streaming_sessionize_runs(spark, events_stream):
    q = (
        sessionize(events_stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from sessions").toPandas()
    assert len(out) > 0
    assert (out.n_events > 0).all()


def test_streaming_cluster_counts_match_batch(spark, sf_dir, tmp_path_factory):
    """The live grid-cluster feed must equal the batch A1-grid aggregate
    on the same points (complete mode, availableNow)."""
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.operators.grid_cluster import cluster_grid
    from arrow_supercluster_spark.sources.points import derived_points
    from arrow_supercluster_spark.streaming.events import streaming_cluster_counts

    src = str(tmp_path_factory.mktemp("pts_src"))
    pts = derived_points(spark, sf_dir)
    pts.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(pts.schema).parquet(src)

    q = (
        streaming_cluster_counts(stream, zoom=6)
        .writeStream.format("memory")
        .queryName("live_clusters")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select cell_x, cell_y, num_points, round(sum_x, 9) as sx,"
        " round(sum_y, 9) as sy from live_clusters"
    ).toPandas()
    want = (
        cluster_grid(pts, 6)
        .select(
            "cell_x", "cell_y", "num_points",
            F.round("sum_x", 9).alias("sx"), F.round("sum_y", 9).alias("sy"),
        )
        .toPandas()
    )
    key = ["cell_x", "cell_y"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
    )


def test_streaming_hierarchy_maintenance_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streaming ingest via maintain_hierarchy (foreachBatch → leaf merge
    algebra) must produce the same hierarchy as one batch load of all the
    points — per-file micro-batches force at least two append folds."""
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.engine import ArrowClusterEngine
    from arrow_supercluster_spark.sources.points import derived_points
    from arrow_supercluster_spark.streaming.events import maintain_hierarchy

    src = str(tmp_path_factory.mktemp("pts_inc"))
    pts = derived_points(spark, sf_dir)
    half = pts.filter(F.col("id") % 2 == 0)
    rest = pts.filter(F.col("id") % 2 != 0)
    half.coalesce(1).write.mode("overwrite").parquet(src)
    rest.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(pts.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    eng = ArrowClusterEngine(
        spark, workdir=str(tmp_path_factory.mktemp("eng_inc"))
    )
    q = maintain_hierarchy(stream, eng).trigger(availableNow=True).start()
    q.awaitTermination(180)

    ref = ArrowClusterEngine(
        spark, workdir=str(tmp_path_factory.mktemp("eng_ref"))
    ).load(pts)

    cols = ["zoom", "cell_x", "cell_y", "num_points"]
    got = sorted(map(tuple, eng._require().select(*cols).collect()))
    want = sorted(map(tuple, ref._require().select(*cols).collect()))
    assert got == want and len(got) > 0
