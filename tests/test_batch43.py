"""Batch-43 tests: k-anonymity conservation, l<=k, fan-out conservation."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_table


def test_k_anonymity_conservation(spark, sf_dir):
    rows = REGISTRY["q_k_anonymity"].spark(spark, sf_dir).collect()
    n_cust = read_table(spark, sf_dir, "customer").count()
    assert sum(r.k for r in rows) == n_cust
    for r in rows:
        assert r.k >= 1
        assert r.below_k == int(r.k < 5)


def test_l_diversity_bounds(spark, sf_dir):
    krows = {(r.c_mktsegment, r.nation): r.k for r in REGISTRY["q_k_anonymity"].spark(spark, sf_dir).collect()}
    lrows = REGISTRY["q_l_diversity"].spark(spark, sf_dir).collect()
    assert len(lrows) == len(krows)
    for r in lrows:
        assert 1 <= r.l <= r.k
        assert r.k == krows[(r.c_mktsegment, r.nation)]
        assert r.below_l == int(r.l < 3)


def test_join_fanout_conservation(spark, sf_dir):
    row = REGISTRY["q_join_fanout"].spark(spark, sf_dir).collect()[0]
    n_orders = read_table(spark, sf_dir, "orders").count()
    n_items = read_table(spark, sf_dir, "lineitem").join(
        read_table(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"), "leftsemi"
    ).count()
    assert row.n_keys == n_orders
    assert row.min_fanout >= 0
    assert abs(row.avg_fanout - n_items / n_orders) < 1.01e-6
    assert row.min_fanout <= row.p99_fanout <= row.max_fanout
