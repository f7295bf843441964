"""Batch-196 tests: pinball/CRPS/interval-score replays against a
pure-python forecaster built from the same train/test split, plus
proper-scoring-rule invariants (CRPS ≥ 0, pinball minimized at the
true quantile family, coverage bounds)."""

import datetime
import math

from pyspark.sql import functions as F


def _split_rows(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext201 import _FS_SPLIT
    from arrow_supercluster_spark.sources.tables import read_events

    cut = datetime.datetime.fromisoformat(_FS_SPLIT)
    rows = (
        read_events(spark, sf_dir)
        .select(
            F.hour("ts").alias("h"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
            "ts",
        )
        .collect()
    )
    train, test = {}, {}
    for r in rows:
        tgt = train if r.ts.replace(tzinfo=None) < cut else test
        tgt.setdefault(r.h, []).append(r.y)
    return train, test


def _type1_quantile(sorted_vals, k):
    n = len(sorted_vals)
    # smallest v with 10*cum >= k*n
    cum = 0
    last = None
    for v in sorted_vals:
        cum += 1
        if 10 * cum >= k * n:
            last = v
            break
    return last


def test_pinball_loss_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext201 import (
        _FS_TAUS,
        q_pinball_loss,
    )

    train, test = _split_rows(spark, sf_dir)
    got = {round(r.tau, 1): r for r in q_pinball_loss(spark, sf_dir).collect()}
    assert sorted(got) == [k / 10 for k in _FS_TAUS]
    for k in _FS_TAUS:
        q = {h: _type1_quantile(sorted(vs), k) for h, vs in train.items()}
        loss10 = 0
        n = 0
        for h, ys in test.items():
            if h not in q:
                continue
            for y in ys:
                loss10 += k * max(y - q[h], 0) + (10 - k) * max(
                    q[h] - y, 0
                )
                n += 1
        r = got[k / 10]
        assert r.n_test == n
        assert abs(r.mean_pinball - round(loss10 / (1000.0 * n), 6)) < 1e-9


def test_crps_matches_brute_force(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext201 import (
        q_crps_empirical,
    )

    train, test = _split_rows(spark, sf_dir)
    got = {r.hour: r for r in q_crps_empirical(spark, sf_dir).collect()}
    hours = sorted(set(train) & set(test))
    assert sorted(got) == hours
    for h in hours:
        xs, ys = train[h], test[h]
        n, m = len(xs), len(ys)
        exx = sum(abs(a - b) for a in xs for b in xs) / (n * n)
        crps = (
            sum(
                sum(abs(x - y) for x in xs) / n - exx / 2.0
                for y in ys
            )
            / m
            / 100.0
        )
        r = got[h]
        assert (r.n_train, r.n_test) == (n, m)
        assert abs(r.mean_crps - crps) < 1e-6
        assert r.mean_crps >= 0  # CRPS is a nonneg proper score


def test_interval_score_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext201 import (
        q_interval_score,
    )

    train, test = _split_rows(spark, sf_dir)
    got = {r.hour: r for r in q_interval_score(spark, sf_dir).collect()}
    covs = []
    for h in sorted(set(train) & set(test)):
        lo = _type1_quantile(sorted(train[h]), 1)
        hi = _type1_quantile(sorted(train[h]), 9)
        ys = test[h]
        tot = sum(
            (hi - lo) + 10 * max(lo - y, 0) + 10 * max(y - hi, 0)
            for y in ys
        )
        cov = sum(1 for y in ys if lo <= y <= hi) / len(ys)
        r = got[h]
        assert r.n_test == len(ys)
        assert abs(
            r.mean_interval_score - round(tot / (100.0 * len(ys)), 6)
        ) < 1e-9
        assert abs(r.coverage - round(cov, 6)) < 1e-9
        covs.append(cov)
    # uniform-ish stationary data: pooled coverage near the nominal 80%
    assert 0.5 < sum(covs) / len(covs) < 1.0
