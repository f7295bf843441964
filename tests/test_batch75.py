"""Batch-75 tests: discount-band conservation, trade-balance identity."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_table


def test_discount_bands_conservation(spark, sf_dir):
    rows = REGISTRY["q_discount_bands"].spark(spark, sf_dir).collect()
    li = read_table(spark, sf_dir, "lineitem")
    assert sum(r.n_items for r in rows) == li.count()
    total = li.agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    ).collect()[0][0]
    assert abs(sum(r.revenue for r in rows) - total) < 1.0
    for r in rows:
        assert 0 <= r.discount_pct <= 100


def test_trade_balance_identity(spark, sf_dir):
    rows = REGISTRY["q_trade_balance"].spark(spark, sf_dir).collect()
    assert len(rows) == read_table(spark, sf_dir, "nation").count()
    # global buys == global sells == total net revenue (same fact table)
    buy = sum(r.buy_rev for r in rows)
    sell = sum(r.sell_rev for r in rows)
    assert abs(buy - sell) < 1.0
    assert abs(sum(r.balance for r in rows)) < 1.0
    for r in rows:
        assert abs(r.balance - round(r.sell_rev - r.buy_rev, 4)) < 1e-6
