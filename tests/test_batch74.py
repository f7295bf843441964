"""Batch-74 tests: return-rate conservation, lead-time sanity."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_table


def test_return_rates_conservation(spark, sf_dir):
    rows = REGISTRY["q_return_rates"].spark(spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem")
    joined = li.join(
        read_table(spark, sf_dir, "part").select("p_partkey"),
        li.l_partkey == F.col("p_partkey"), "leftsemi"
    )
    assert sum(r.n_items for r in rows) == joined.count()
    total_returned = joined.filter(F.col("l_returnflag") == "R").count()
    assert sum(r.n_returned for r in rows) == total_returned
    for r in rows:
        assert 0.0 <= r.return_rate <= 1.0
        assert r.revenue_at_risk >= 0


def test_ship_lead_time_sanity(spark, sf_dir):
    rows = REGISTRY["q_ship_lead_time"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n > 0
        assert 0 <= r.p50_days <= r.p90_days <= r.max_days
