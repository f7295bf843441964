"""Batch-158 tests: TPC-H Q3/Q10/Q18 shapes vs pandas-computed ground
truth on the same tables."""

import pandas as pd


def _pdf(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet").toPandas()


def test_tpch_q3_ground_truth(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext163 import (
        _Q3_DATE,
        _Q3_SEG,
        q_tpch_q3,
    )

    rows = q_tpch_q3(spark, sf_dir).collect()
    c = _pdf(spark, sf_dir, "customer")
    o = _pdf(spark, sf_dir, "orders")
    li = _pdf(spark, sf_dir, "lineitem")
    cut = pd.Timestamp(_Q3_DATE)
    c = c[c.c_mktsegment == _Q3_SEG]
    o = o[(o.o_orderdate < cut) & o.o_custkey.isin(c.c_custkey)]
    li = li[(li.l_shipdate > cut) & li.l_orderkey.isin(o.o_orderkey)]
    li = li.assign(
        cents=(li.l_extendedprice * (1 - li.l_discount) * 100)
        .round().astype("int64")
    )
    rev = li.groupby("l_orderkey").cents.sum() / 100.0
    omap = o.set_index("o_orderkey")
    want = sorted(
        (
            (-round(v, 2), omap.loc[k].o_orderdate, k)
            for k, v in rev.items()
        )
    )[:10]
    assert len(rows) == min(10, len(want)) > 0
    for row, (negrev, od, k) in zip(rows, want):
        assert row.l_orderkey == k
        assert abs(row.revenue - (-negrev)) < 1e-6
        assert row.o_orderdate == od.to_pydatetime()


def test_tpch_q10_ground_truth(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext163 import (
        _Q10_END,
        _Q10_START,
        q_tpch_q10,
    )

    rows = q_tpch_q10(spark, sf_dir).collect()
    c = _pdf(spark, sf_dir, "customer")
    o = _pdf(spark, sf_dir, "orders")
    li = _pdf(spark, sf_dir, "lineitem")
    o = o[
        (o.o_orderdate >= pd.Timestamp(_Q10_START))
        & (o.o_orderdate < pd.Timestamp(_Q10_END))
    ]
    li = li[(li.l_returnflag == "R") & li.l_orderkey.isin(o.o_orderkey)]
    j = li.merge(
        o[["o_orderkey", "o_custkey"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    j = j.assign(
        cents=(j.l_extendedprice * (1 - j.l_discount) * 100)
        .round().astype("int64")
    )
    rev = j.groupby("o_custkey").cents.sum() / 100.0
    want = sorted(((-round(v, 2), k) for k, v in rev.items()))[:20]
    assert len(rows) == min(20, len(want)) > 0
    for row, (negrev, k) in zip(rows, want):
        assert row.c_custkey == k
        assert abs(row.lost_revenue - (-negrev)) < 1e-6
    # nation names attached correctly
    n = _pdf(spark, sf_dir, "nation").set_index("n_nationkey")
    cm = c.set_index("c_custkey")
    for row in rows:
        assert row.n_name == n.loc[cm.loc[row.c_custkey].c_nationkey].n_name


def test_tpch_q18_ground_truth(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext163 import (
        _Q18_QTY,
        q_tpch_q18,
    )

    rows = q_tpch_q18(spark, sf_dir).collect()
    li = _pdf(spark, sf_dir, "lineitem")
    qty = li.groupby("l_orderkey").l_quantity.sum()
    big = set(qty[qty > _Q18_QTY].index)
    assert big, "threshold must qualify at least one order at sf0.01"
    assert {row.o_orderkey for row in rows} <= big
    assert len(rows) == min(100, len(big))
    for row in rows:
        assert abs(row.total_qty - round(qty[row.o_orderkey], 2)) < 1e-6
        assert row.total_qty > _Q18_QTY
    # ordering: totalprice DESC
    prices = [row.o_totalprice for row in rows]
    assert prices == sorted(prices, reverse=True)
