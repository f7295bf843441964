"""Batch-62 tests: chi-square vs reference, PR-curve monotone recall."""

from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_chi2_reference(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    counts = defaultdict(int)
    rows_m = defaultdict(int)
    cols_m = defaultdict(int)
    for r in docs:
        counts[(r.source, r.lang)] += 1
        rows_m[r.source] += 1
        cols_m[r.lang] += 1
    n = len(docs)
    chi2 = 0.0
    for s in rows_m:
        for l in cols_m:
            e = rows_m[s] * cols_m[l] / n
            o = counts.get((s, l), 0)
            chi2 += (o - e) ** 2 / e
    row = REGISTRY["q_chi2_independence"].spark(spark, sf_dir).collect()[0]
    assert row.n_cells == len(rows_m) * len(cols_m)
    assert row.dof == (len(rows_m) - 1) * (len(cols_m) - 1)
    assert abs(row.chi2 - chi2) < 1.01e-4


def test_pr_curve_monotone(spark, sf_dir):
    rows = sorted(REGISTRY["q_pr_curve"].spark(spark, sf_dir).collect(), key=lambda r: r.t_id)
    assert len(rows) == 9
    # raising the threshold can only lower recall
    recalls = [r.recall for r in rows if r.recall is not None]
    assert all(b <= a + 1e-9 for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        assert r.tp + r.fn == rows[0].tp + rows[0].fn  # positives conserved
        if r.precision_ is not None:
            assert 0.0 <= r.precision_ <= 1.0
