"""Batch-205 tests: logistic Newton replay (numpy, same 4 unrolled
steps) + loss-decrease invariant, Cliff's-delta brute force, Somers' D
brute force + AUC identity."""

import math

import numpy as np
from pyspark.sql import functions as F


def test_logistic_irls_matches_numpy_newton(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext210 import (
        _LR_ITERS,
        _LR_VALUE_MIN,
        q_logistic_irls,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicks"),
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("views"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > _LR_VALUE_MIN),
                    1,
                ).otherwise(0)
            ).alias("y"),
        )
        .collect()
    )
    X = np.array(
        [[1.0, r.clicks / 10.0, r.views / 10.0] for r in rows]
    )
    y = np.array([r.y for r in rows], dtype=float)
    beta = np.zeros(3)
    losses = []
    for _ in range(_LR_ITERS):
        z = X @ beta
        p = 1.0 / (1.0 + np.exp(-z))
        losses.append(
            -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
        )
        W = p * (1 - p)
        A = X.T @ (X * W[:, None])
        g = X.T @ (y - p)
        beta = beta + np.linalg.solve(A, g)
    p = 1.0 / (1.0 + np.exp(-(X @ beta)))
    loss = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    acc = np.mean((p > 0.5) == (y == 1))
    [r] = q_logistic_irls(spark, sf_dir).collect()
    assert r.n == len(rows)
    assert abs(r.beta0 - beta[0]) < 1e-4
    assert abs(r.beta1 - beta[1]) < 1e-4
    assert abs(r.beta2 - beta[2]) < 1e-4
    assert abs(r.log_loss - loss) < 1e-5
    assert abs(r.accuracy - acc) < 1e-6  # accuracy is rounded to 6
    # Newton on a convex loss: training loss never worse than iter-0
    assert r.log_loss <= losses[0] + 1e-9


def _purchase_by_arm(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.pmod("user_id", F.lit(2)).alias("arm"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    a = [r.c for r in rows if r.arm == 0]
    b = [r.c for r in rows if r.arm == 1]
    return a, b


def test_cliffs_delta_matches_brute_force(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext210 import (
        q_cliffs_delta,
    )

    a, b = _purchase_by_arm(spark, sf_dir)
    gt = sum(1 for x in a for y in b if x > y)
    lt = sum(1 for x in a for y in b if x < y)
    delta = (gt - lt) / (len(a) * len(b))
    [r] = q_cliffs_delta(spark, sf_dir).collect()
    assert (r.n0, r.n1) == (len(a), len(b))
    assert abs(r.cliffs_delta - round(delta, 6)) < 1e-9
    mag = (
        "negligible"
        if abs(delta) < 0.147
        else "small"
        if abs(delta) < 0.33
        else "medium"
        if abs(delta) < 0.474
        else "large"
    )
    assert r.magnitude == mag
    assert -1 <= r.cliffs_delta <= 1


def test_somers_d_matches_brute_force(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext210 import (
        q_somers_d,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .select(
            F.round(F.col("value") * 100).cast("long").alias("c"),
            F.when(F.hour("ts") >= 18, 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    ones = [r.c for r in rows if r.y == 1]
    zeros = [r.c for r in rows if r.y == 0]
    conc = sum(1 for x in ones for z in zeros if x > z)
    disc = sum(1 for x in ones for z in zeros if x < z)
    d = (conc - disc) / (len(ones) * len(zeros))
    [r] = q_somers_d(spark, sf_dir).collect()
    assert (r.n1, r.n0) == (len(ones), len(zeros))
    assert abs(r.somers_d - round(d, 6)) < 1e-9
    assert abs(r.auc_equivalent - round((d + 1) / 2, 6)) < 1e-9
    # ties-as-half AUC identity
    ties = sum(1 for x in ones for z in zeros if x == z)
    auc = (conc + 0.5 * ties) / (len(ones) * len(zeros))
    assert abs(r.auc_equivalent - auc) < 1e-4
