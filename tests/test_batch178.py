"""Batch-178 tests: mergeSchema accounting replay, partition-prune
plan assertion + count conservation, scratch-path overwrite hygiene."""

import os

from pyspark.sql import functions as F


def test_schema_evolution_matches_construction(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext182 import (  # noqa: F401
        q_bartlett,  # import sanity: sibling module loads
    )
    from arrow_supercluster_spark.plans.registry_ext183 import (
        q_schema_evolution,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    want = {}
    for d in docs:
        r = want.setdefault(d.source, [0, 0, 0])
        r[0] += 1
        if d.doc_id % 2 == 1:
            r[1] += 1
            r[2] += d.n_chars
    for row in q_schema_evolution(spark, sf_dir).collect():
        n, nw, sc = want[row.source]
        assert (row.n_rows, row.n_with_chars, row.sum_chars) == (n, nw, sc)


def test_partition_prune_readback_plan_and_counts(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext183 import (
        _PPR_TYPE,
        q_partition_prune_readback,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    df = q_partition_prune_readback(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the single-type filter must reach the scan as a PARTITION filter
    # (directory pruning), not a post-scan data filter
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "event_type" in seg, seg
    # conservation: pruned readback sums to the direct per-type counts
    got = sum(r.n for r in df.collect())
    want = read_events(spark, sf_dir).filter(
        F.col("event_type") == _PPR_TYPE
    ).count()
    assert got == want


def test_scratch_paths_are_fixed_and_overwritten(spark, sf_dir):
    """The r6 q_hll_stream lesson, structurally: repeated runs must
    reuse the SAME scratch directory (no mkdtemp accumulation)."""
    from arrow_supercluster_spark.plans.registry_ext183 import (
        _scratch,
        q_schema_evolution,
    )

    p1 = _scratch("schema_evo", sf_dir)
    q_schema_evolution(spark, sf_dir).count()
    mtime1 = os.path.getmtime(p1)
    q_schema_evolution(spark, sf_dir).count()
    assert _scratch("schema_evo", sf_dir) == p1
    assert os.path.getmtime(p1) >= mtime1
    # distinct sf dirs get distinct scratch roots
    assert _scratch("schema_evo", "/a/sfX") != p1
