"""Batch-93 tests: multiset semantics, melt shape, butterfly hand
count."""

import tempfile

from pyspark.sql import functions as F


def test_set_operators_multiset_semantics(spark):
    """doc 1: 'table' ×3, 'value' ×1 → intersect mult 1, except mult 2.
    doc 2: only 'value' → neither bag-A row survives."""
    from arrow_supercluster_spark.plans.registry_ext98 import (
        q_set_operators,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [
                (1, "table x table y table value"),
                (2, "value value z"),
                (3, "table table value value"),
            ],
            "doc_id long, text string",
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            (r.op, r.doc_id): r.multiplicity
            for r in q_set_operators(spark, d).collect()
        }
        assert got == {
            ("intersect_all", 1): 1,
            ("except_all", 1): 2,
            ("intersect_all", 3): 2,
        }


def test_unpivot_shape_and_values(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext98 import q_unpivot

    rows = q_unpivot(spark, sf_dir).collect()
    prios = {r.priority for r in rows}
    # 3 metrics per priority, long format
    assert len(rows) == 3 * len(prios)
    metrics = {r.metric for r in rows}
    assert metrics == {"n_orders", "revenue", "avg_price"}
    # n_orders re-aggregates to the table row count
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = sum(r.value for r in rows if r.metric == "n_orders")
    assert total == o.count()


def test_butterfly_hand_count(spark):
    """custs 1,2 share priorities P1,P2 → C(2,2)=1 butterfly; cust 3
    shares only P1 with each → shared=1 rows, 0 butterflies."""
    from arrow_supercluster_spark.plans.registry_ext98 import (
        q_butterfly_count,
    )

    with tempfile.TemporaryDirectory() as d:
        rows = [
            (1, 1, "P1"), (2, 1, "P2"),
            (3, 2, "P1"), (4, 2, "P2"),
            (5, 3, "P1"),
        ]
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_orderpriority string"
        ).write.parquet(f"{d}/orders.parquet")
        got = {
            r.shared: (r.n_pairs, r.butterflies)
            for r in q_butterfly_count(spark, d).collect()
        }
        assert got == {2: (1, 1), 1: (2, 0)}
