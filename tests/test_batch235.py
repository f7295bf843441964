"""Batch 235 replays — HDR quantile sketch, WL refinement,
blocklist (R689–R691).  Each entry carries an algebraic/accuracy
invariant here on top of its DuckDB differential in the sweep."""

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_hdr_quantiles_accuracy(spark, sf_dir):
    """Each HDR estimate must be within the 12.5% relative-error
    bound of the true (numpy lower-interpolation) percentile, and
    estimates must be monotone p50 <= p95 <= p99."""
    rows = REGISTRY["q_hdr_quantiles"].spark(spark, sf_dir).collect()
    cents = {
        p: np.array(
            [
                int(round(r.o_totalprice * 100))
                for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
                .filter(F.col("o_orderpriority") == p)
                .select("o_totalprice")
                .collect()
            ]
        )
        for p in {r.priority for r in rows}
    }
    assert rows
    for r in rows:
        c = np.sort(cents[r.priority])
        n = len(c)
        assert r.n_orders == n
        assert r.p50_cents <= r.p95_cents <= r.p99_cents
        for q, est in ((50, r.p50_cents), (95, r.p95_cents), (99, r.p99_cents)):
            # the sketch's own rank definition: smallest cum >= q% of n
            true = int(c[int(np.ceil(q * n / 100.0)) - 1])
            # est = bucket lower bound containing rank element:
            # lb <= true < lb * 9/8 (worst bucket width at sub=0)
            assert est <= true
            assert est * 9 > true * 8, (r.priority, q, est, true)


def test_wl_refinement_monotone(spark, sf_dir):
    """Refinement never loses classes: n_colors is non-decreasing per
    round, node count is stable, colors <= nodes."""
    rows = sorted(
        REGISTRY["q_wl_refinement"].spark(spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [0, 1, 2]
    n_nodes = {r.n_nodes for r in rows}
    assert len(n_nodes) == 1
    assert rows[0].n_colors <= rows[1].n_colors <= rows[2].n_colors
    assert all(r.n_colors <= r.n_nodes for r in rows)


def test_blocklist_any_row_bounds(spark, sf_dir):
    """__any__ distinct docs <= sum of per-phrase docs; every phrase
    that appears as a substring of some doc is reported; occurrence
    counts >= doc counts."""
    rows = REGISTRY["q_blocklist_filter"].spark(spark, sf_dir).collect()
    per = [r for r in rows if r.phrase != "__any__"]
    any_rows = [r for r in rows if r.phrase == "__any__"]
    assert len(any_rows) == 1
    assert any_rows[0].n_docs <= sum(r.n_docs for r in per)
    assert any_rows[0].n_occurrences == sum(r.n_occurrences for r in per)
    for r in per:
        assert r.n_occurrences >= r.n_docs > 0
