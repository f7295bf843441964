"""Batch-52 tests: EM step vs numpy, OLS vs numpy lstsq."""

import numpy as np
from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_gmm_em_step_vs_numpy(spark, sf_dir):
    vals = np.array([
        r.value for r in read_events(spark, sf_dir)
        .filter(F.col("value").isNotNull()).collect()
    ])
    mu1, mu2, sd1, sd2, w1 = 20.0, 80.0, 15.0, 15.0, 0.5
    p1 = np.exp(-((vals - mu1) ** 2) / (2 * sd1 * sd1)) / sd1
    p2 = np.exp(-((vals - mu2) ** 2) / (2 * sd2 * sd2)) / sd2
    g1 = w1 * p1 / (w1 * p1 + (1 - w1) * p2)
    mu1_new = (g1 * vals).sum() / g1.sum()
    row = REGISTRY["q_gmm_em_step"].spark(spark, sf_dir).collect()[0]
    assert row.n == len(vals)
    assert abs(row.w1_new - g1.mean()) < 1.01e-5
    assert abs(row.mu1_new - mu1_new) < 1.01e-4
    assert abs(row.mu2_new - ((1 - g1) * vals).sum() / (1 - g1).sum()) < 1.01e-4
    sd1_new = np.sqrt((g1 * (vals - mu1_new) ** 2).sum() / g1.sum())
    assert abs(row.sd1_new - sd1_new) < 1.01e-4
    assert 0.0 < row.w1_new < 1.0


def test_ols_vs_numpy(spark, sf_dir):
    per = defaultdict(lambda: [0, 0.0, defaultdict(int)])
    for r in read_events(spark, sf_dir).filter(F.col("value").isNotNull()).collect():
        per[r.user_id][0] += 1
        per[r.user_id][1] += r.value
        per[r.user_id][2][r.event_type] += 1
    X, Y = [], []
    for n, s, mix in per.values():
        ps = np.array(list(mix.values())) / n
        ent = float(-(ps * np.log(ps)).sum())
        X.append([n, ent])
        Y.append(round(s, 4))
    X, Y = np.array(X, dtype=float), np.array(Y)
    Xc = X - X.mean(axis=0)
    Yc = Y - Y.mean()
    beta, *_ = np.linalg.lstsq(Xc, Yc, rcond=None)
    pred = Xc @ beta
    r2 = (pred * Yc).sum() / (Yc * Yc).sum()
    row = REGISTRY["q_ols_2var"].spark(spark, sf_dir).collect()[0]
    assert row.n == len(Y)
    assert abs(row.b1 - beta[0]) < 1.01e-4
    assert abs(row.b2 - beta[1]) < 1.01e-3
    assert abs(row.r2 - r2) < 1.01e-5
    assert 0.0 <= row.r2 <= 1.0
