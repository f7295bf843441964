"""Batch-40 tests: Moran's I vs numpy reference, quadrat chi2 reference,
stability bounds + degenerate fixture."""

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry import REGISTRY, _points_xy


def _cell_counts(spark, sf_dir, zoom):
    rows = (
        gc.with_cells(_points_xy(spark, sf_dir), zoom, OPTS)
        .groupBy("cell_x", "cell_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {(r.cell_x, r.cell_y): r.n for r in rows}


def test_morans_i_vs_numpy(spark, sf_dir):
    counts = _cell_counts(spark, sf_dir, 6)
    keys = list(counts)
    n = np.array([counts[k] for k in keys], dtype=float)
    mu = n.mean()
    d = n - mu
    ss = (d * d).sum()
    w_sum = 0
    cross = 0.0
    index = {k: i for i, k in enumerate(keys)}
    for (x, y), i in index.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            j = index.get((x + dx, y + dy))
            if j is not None:
                w_sum += 1
                cross += d[i] * d[j]
    expect = len(keys) * cross / (w_sum * ss)
    row = REGISTRY["q_morans_i"].spark(spark, sf_dir).collect()[0]
    assert row.n_cells == len(keys) and row.w_sum == w_sum
    assert abs(row.morans_i - expect) < 1.01e-5


def test_quadrat_chi2_reference(spark, sf_dir):
    counts = _cell_counts(spark, sf_dir, 6)
    xs = [x for x, _ in counts]
    ys = [y for _, y in counts]
    total = sum(counts.values())
    nq = (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
    exp = total / nq
    chi2 = 0.0
    for x in range(min(xs), max(xs) + 1):
        for y in range(min(ys), max(ys) + 1):
            o = counts.get((x, y), 0)
            chi2 += (o - exp) ** 2 / exp
    row = REGISTRY["q_quadrat_test"].spark(spark, sf_dir).collect()[0]
    assert row.n_quadrats == nq
    assert abs(row.chi2 - chi2) < 0.01
    assert row.chi2 > 0


def test_cluster_stability_bounds(spark, sf_dir):
    row = REGISTRY["q_cluster_stability"].spark(spark, sf_dir).collect()[0]
    assert 0.0 <= row.stability <= 1.0
    assert 0 <= row.n_stable <= row.n_pairs
    # fine cells nest inside coarse cells 2x2, so stability is the
    # within-quadrant cohabitation rate — must be strictly positive here
    assert row.stability > 0
