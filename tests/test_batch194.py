"""Batch-194 tests: CKA/anisotropy/participation-ratio numpy replays on
the same integer-scaled construction, plus diagnostic invariants."""

import math

import numpy as np


def _vecs(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext import _emb

    rows = _emb(spark, sf_dir).select("embedding").collect()
    return [list(r.embedding) for r in rows]


def _eint(vecs, scale):
    return np.array(
        [
            [math.floor(float(x) * scale + 0.5) for x in v]
            for v in vecs
        ],
        dtype=np.int64,
    )


def test_linear_cka_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext199 import (
        _EMB_SCALE,
        _EMB_SPLIT,
        q_linear_cka,
    )

    e = _eint(_vecs(spark, sf_dir), _EMB_SCALE).astype(np.float64)
    n = e.shape[0]
    ec = e - e.mean(axis=0)
    x, y = ec[:, :_EMB_SPLIT], ec[:, _EMB_SPLIT:]
    fxy2 = ((x.T @ y) ** 2).sum()
    fxx = math.sqrt(((x.T @ x) ** 2).sum())
    fyy = math.sqrt(((y.T @ y) ** 2).sum())
    cka = fxy2 / (fxx * fyy)
    [r] = q_linear_cka(spark, sf_dir).collect()
    assert r.n == n
    assert abs(r.linear_cka - cka) < 1e-6
    assert 0 < r.linear_cka <= 1


def test_anisotropy_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext199 import (
        _EMB_SCALE,
        q_anisotropy,
    )

    vecs = _vecs(spark, sf_dir)
    u = []
    for v in vecs:
        acc = 0.0  # left fold, matching both engines' HOF order
        for x in v:
            acc = acc + float(x) * float(x)
        nrm = math.sqrt(acc)
        u.append(
            [math.floor(float(x) / nrm * _EMB_SCALE + 0.5) for x in v]
        )
    u = np.array(u, dtype=np.int64)
    n = u.shape[0]
    s = u.sum(axis=0).astype(np.float64)
    s2 = (s * s).sum()
    sum_n2 = (u.astype(np.float64) ** 2).sum()
    mean_cos = (s2 - sum_n2) / (n * (n - 1)) / (_EMB_SCALE * _EMB_SCALE)
    [r] = q_anisotropy(spark, sf_dir).collect()
    assert r.n == n
    assert abs(r.mean_pairwise_cos - mean_cos) < 1e-6
    # unit vectors: mean pairwise cosine is a valid cosine
    assert -1 <= r.mean_pairwise_cos <= 1


def test_participation_ratio_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext199 import (
        _EMB_D,
        _EMB_SCALE,
        q_participation_ratio,
    )

    e = _eint(_vecs(spark, sf_dir), _EMB_SCALE)
    n = e.shape[0]
    s1 = e.sum(axis=0).astype(np.float64)
    s2 = (e.astype(np.float64) ** 2).sum(axis=0)
    var = (s2 - s1 * s1 / n) / (n - 1) / (_EMB_SCALE * _EMB_SCALE)
    pr = var.sum() ** 2 / (var * var).sum()
    [r] = q_participation_ratio(spark, sf_dir).collect()
    assert (r.n, r.d) == (n, _EMB_D)
    assert abs(r.participation_ratio - pr) < 1e-3
    assert abs(r.top_var_share - var.max() / var.sum()) < 1e-5
    assert abs(r.total_var - var.sum()) < 1e-5
    # PR is bounded by the ambient dimension; 1 <= PR <= d
    assert 1 <= r.participation_ratio <= _EMB_D
    # synthetic gaussian-ish embeddings should be near-isotropic
    assert r.participation_ratio > _EMB_D / 2
