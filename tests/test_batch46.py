"""Batch-46 tests: nth-purchase vs Python ordering, weighted median
reference, dup-size conservation."""

from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events, read_table


def test_nth_purchase_vs_python(spark, sf_dir):
    p = read_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("user_id", F.unix_micros("ts").alias("us"), F.round("value", 4).alias("v")).collect()
    per_user = defaultdict(list)
    for r in p:
        per_user[r.user_id].append((r.us, r.v))
    got = {r.user_id: r for r in REGISTRY["q_nth_purchase"].spark(spark, sf_dir).collect()}
    assert set(got) == set(per_user)
    for u, events in per_user.items():
        events.sort()
        vs = [v for _, v in events]
        r = got[u]
        assert r.n_purchases == len(vs)
        assert r.first_v == vs[0]
        assert r.second_v == (vs[1] if len(vs) > 1 else None)
        assert r.third_v == (vs[2] if len(vs) > 2 else None)


def test_weighted_median_reference(spark, sf_dir):
    rows = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0).select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("up"),
        F.col("l_quantity").alias("w"),
    ).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r.l_returnflag].append((r.up, r.w))
    got = {r.rf: r for r in REGISTRY["q_weighted_median"].spark(spark, sf_dir).collect()}
    for rf, items in groups.items():
        items.sort()
        tw = sum(w for _, w in items)
        acc = 0.0
        med = None
        for up, w in items:
            acc += w
            if acc >= tw / 2:
                med = up
                break
        assert got[rf].weighted_median == med
        assert abs(got[rf].total_weight - round(tw, 4)) < 1e-9


def test_dup_cluster_sizes_conservation(spark, sf_dir):
    rows = REGISTRY["q_dup_cluster_sizes"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.size >= 2  # components come from an edge list
    comp = REGISTRY["q_dup_components"].spark(spark, sf_dir)
    n_nodes = comp.count()
    assert sum(r.size * r.n_clusters for r in rows) == n_nodes
