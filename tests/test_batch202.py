"""Batch-202 tests: contingency replays of V-measure family / ARI /
FMI (sklearn cross-checked when available), plus measure bounds."""

import math

import numpy as np


def _partitions(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext import _emb
    from arrow_supercluster_spark.plans.registry_ext207 import (
        _SCALE,
        _SIGNS,
    )

    rows = _emb(spark, sf_dir).select("label", "embedding").collect()
    labels, buckets = [], []
    for r in rows:
        v = np.array(
            [math.floor(float(x) * _SCALE + 0.5) for x in r.embedding],
            dtype=np.int64,
        )
        b = 0
        for i, signs in enumerate(_SIGNS):
            if int(v @ np.array(signs, dtype=np.int64)) > 0:
                b |= 1 << i
        labels.append(r.label)
        buckets.append(b)
    return labels, buckets


def _contingency(labels, buckets):
    cells = {}
    for l, b in zip(labels, buckets):
        cells[(b, l)] = cells.get((b, l), 0) + 1
    a = {}
    bm = {}
    for (bk, l), n in cells.items():
        a[bk] = a.get(bk, 0) + n
        bm[l] = bm.get(l, 0) + n
    return cells, a, bm, len(labels)


def test_partition_agreement_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext207 import (
        q_partition_agreement,
    )

    labels, buckets = _partitions(spark, sf_dir)
    cells, a, bm, n = _contingency(labels, buckets)
    h_l = -sum((c / n) * math.log(c / n) for c in bm.values())
    h_b = -sum((c / n) * math.log(c / n) for c in a.values())
    h_lb = -sum(
        (c / n) * math.log(c / a[bk]) for (bk, l), c in cells.items()
    )
    h_bl = -sum(
        (c / n) * math.log(c / bm[l]) for (bk, l), c in cells.items()
    )
    hom = 1 - h_lb / h_l
    com = 1 - h_bl / h_b
    v = 2 * hom * com / (hom + com)
    [r] = q_partition_agreement(spark, sf_dir).collect()
    assert abs(r.homogeneity - round(hom, 6)) < 1e-6
    assert abs(r.completeness - round(com, 6)) < 1e-6
    assert abs(r.v_measure - round(v, 6)) < 1e-6
    assert 0 <= r.homogeneity <= 1 and 0 <= r.completeness <= 1
    try:
        from sklearn.metrics import homogeneity_completeness_v_measure
    except ImportError:
        return
    hs, cs, vs = homogeneity_completeness_v_measure(labels, buckets)
    assert abs(r.homogeneity - hs) < 1e-5
    assert abs(r.completeness - cs) < 1e-5
    assert abs(r.v_measure - vs) < 1e-5


def test_adjusted_rand_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext207 import (
        q_adjusted_rand,
    )

    labels, buckets = _partitions(spark, sf_dir)
    cells, a, bm, n = _contingency(labels, buckets)
    sij = sum(c * (c - 1) // 2 for c in cells.values())
    sa = sum(c * (c - 1) // 2 for c in a.values())
    sb = sum(c * (c - 1) // 2 for c in bm.values())
    sn = n * (n - 1) // 2
    e = sa * sb / sn
    ari = (sij - e) / ((sa + sb) / 2 - e)
    [r] = q_adjusted_rand(spark, sf_dir).collect()
    assert (r.sij, r.sa, r.sb, r.sn) == (sij, sa, sb, sn)
    assert abs(r.ari - round(ari, 6)) < 1e-9
    # random labels vs geometry: agreement must be near chance
    assert -0.5 < r.ari < 0.5
    try:
        from sklearn.metrics import adjusted_rand_score
    except ImportError:
        return
    assert abs(r.ari - adjusted_rand_score(labels, buckets)) < 1e-6


def test_fowlkes_mallows_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext207 import (
        q_fowlkes_mallows,
    )

    labels, buckets = _partitions(spark, sf_dir)
    cells, a, bm, n = _contingency(labels, buckets)
    tp = sum(c * (c - 1) // 2 for c in cells.values())
    tp_fp = sum(c * (c - 1) // 2 for c in a.values())
    tp_fn = sum(c * (c - 1) // 2 for c in bm.values())
    fmi = tp / math.sqrt(tp_fp * tp_fn)
    [r] = q_fowlkes_mallows(spark, sf_dir).collect()
    assert (r.tp, r.tp_fp, r.tp_fn) == (tp, tp_fp, tp_fn)
    assert abs(r.fmi - round(fmi, 6)) < 1e-9
    assert 0 <= r.fmi <= 1
    try:
        from sklearn.metrics import fowlkes_mallows_score
    except ImportError:
        return
    assert abs(r.fmi - fowlkes_mallows_score(labels, buckets)) < 1e-6
