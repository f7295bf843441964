"""Batch-151 tests: Ripley's K vs brute-force python, join counts vs
brute force + a random-coloring null, HHI properties."""

import numpy as np


def _pts(spark, sf_dir):
    from arrow_supercluster_spark.sources.points import derived_points
    from pyspark.sql import functions as F

    rows = (
        derived_points(spark, sf_dir)
        .filter(F.col("lng").isNotNull() & F.col("lat").isNotNull())
        .select("id", "lng", "lat")
        .collect()
    )
    return np.array([[r.lng, r.lat] for r in rows])


def test_ripleys_k_bruteforce(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext156 import (
        _RK_RADII,
        q_ripleys_k,
    )

    got = {r.r: r for r in q_ripleys_k(spark, sf_dir).collect()}
    xy = _pts(spark, sf_dir)
    n = len(xy)
    area = (xy[:, 0].max() - xy[:, 0].min()) * (
        xy[:, 1].max() - xy[:, 1].min()
    )
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    assert set(got) == set(float(r) for r in _RK_RADII)
    for r in _RK_RADII:
        cnt = int((d <= r).sum())
        k = area * cnt / (n * (n - 1))
        row = got[float(r)]
        assert row.n_pairs_within == cnt
        assert abs(row.ripley_k - k) < 1e-4
        assert abs(row.ripley_l - np.sqrt(k / np.pi)) < 1e-4
        assert row.clustered == (np.sqrt(k / np.pi) > r)
    # multi-scale signature of the lattice-like generator: every radius
    # has pairs, and the curve is strictly increasing in r
    ls = [got[float(r)].ripley_k for r in _RK_RADII]
    assert all(got[float(r)].n_pairs_within > 0 for r in _RK_RADII)
    assert ls == sorted(ls) and ls[0] < ls[-1]


def test_join_counts_bruteforce_and_random_null(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext156 import (
        _JC_R,
        q_join_counts,
    )

    r = q_join_counts(spark, sf_dir).collect()[0]
    xy = _pts(spark, sf_dir)
    black = (np.floor(xy[:, 1] / 10).astype(np.int64) % 2) == 0
    d = np.sqrt(((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    near = d <= _JC_R
    j = int(near.sum()) // 2
    bb = int((near & black[:, None] & black[None, :]).sum()) // 2
    ww = int((near & ~black[:, None] & ~black[None, :]).sum()) // 2
    assert (r.n_joins, r.bb, r.ww, r.bw) == (j, bb, ww, j - bb - ww)
    n, nb = len(xy), int(black.sum())
    assert abs(r.bb_expected - j * nb * (nb - 1) / (n * (n - 1))) < 1e-3
    # 10-degree band coloring is spatially structured: 1-degree
    # neighbors almost always share a band => BB well above chance
    assert r.bb_ratio > 1.5
    # null check: random labels with the same margin give ratio ~ 1
    rng = np.random.default_rng(3)
    ratios = []
    for _ in range(20):
        lab = np.zeros(n, bool)
        lab[rng.choice(n, nb, replace=False)] = True
        bb_r = int((near & lab[:, None] & lab[None, :]).sum()) // 2
        ratios.append(bb_r / (j * nb * (nb - 1) / (n * (n - 1))))
    assert abs(np.mean(ratios) - 1) < 0.15


def test_herfindahl_properties(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext156 import q_herfindahl
    from pyspark.sql import functions as F

    r = q_herfindahl(spark, sf_dir).collect()[0]
    rev = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * 100
                ).cast("long")
            ).alias("r")
        )
        .collect()
    )
    shares = np.array([x.r for x in rev], float)
    shares /= shares.sum()
    hhi = (shares**2).sum()
    assert r.n_suppliers == len(rev)
    assert abs(r.hhi - hhi) < 1e-5
    assert 1 / len(rev) <= r.hhi <= 1
    assert abs(
        r.hhi_normalized - (hhi - 1 / len(rev)) / (1 - 1 / len(rev))
    ) < 1e-5
    assert abs(r.effective_competitors - 1 / hhi) < 1e-2
    assert r.effective_competitors <= len(rev)
