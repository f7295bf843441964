"""Sketch accuracy + connected-components correctness tests."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import connected_components
from arrow_supercluster_spark.sources.tables import read_events


def test_approx_distinct_within_tolerance(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    approx = {
        r.event_type: r.a
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("a"))
        .collect()
    }
    exact = {
        r.event_type: r.e
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("e"))
        .collect()
    }
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k]), (
            k, approx[k], exact[k],
        )


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3, clique 10-11-12, isolated edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id long, b_id long",
    )
    got = {
        r.node_id: r.component_id for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_path_converges(spark):
    # a path of 40 nodes exercises multi-round label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a_id long, b_id long"
    )
    got = connected_components(pairs).toPandas()
    assert (got.component_id == 0).all()
    assert len(got) == 41
