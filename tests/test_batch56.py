"""Batch-56 tests: FK audit coverage + spot orphan check, fold balance."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events, read_table


def test_fk_audit_coverage(spark, sf_dir):
    rows = {r.fk: r for r in REGISTRY["q_fk_audit"].spark(spark, sf_dir).collect()}
    assert len(rows) == 7
    for r in rows.values():
        assert 0 <= r.n_orphans <= r.n_child
    # spot check one edge against a direct anti-join
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    direct = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").count()
    assert rows["lineitem.l_orderkey"].n_orphans == direct
    assert rows["lineitem.l_orderkey"].n_child == li.count()


def test_fold_stability(spark, sf_dir):
    rows = REGISTRY["q_fold_stability"].spark(spark, sf_dir).collect()
    assert {r.fold for r in rows} <= set(range(5))
    n_users = read_events(spark, sf_dir).filter(F.col("value").isNotNull()) \
        .select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_users
    for r in rows:
        assert r.n > 0 and r.mean_spend > 0
