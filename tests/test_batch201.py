"""Batch-201 tests: Hopkins replay (probe construction included),
Dunn brute-force replay, LOOCV 1-NN replay + beats-chance check."""

import math

import numpy as np


def _eint(spark, sf_dir, scale):
    from arrow_supercluster_spark.plans.registry_ext import _emb

    rows = _emb(spark, sf_dir).select(
        "vec_id", "label", "embedding"
    ).collect()
    ids = [r.vec_id for r in rows]
    labels = {r.vec_id: r.label for r in rows}
    V = {
        r.vec_id: np.array(
            [math.floor(float(x) * scale + 0.5) for x in r.embedding],
            dtype=np.int64,
        )
        for r in rows
    }
    return ids, labels, V


def test_hopkins_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext206 import (
        _EMB_D,
        _HOP_M,
        _P,
        _SCALE,
        q_hopkins,
    )

    ids, _, V = _eint(spark, sf_dir, _SCALE)
    M = np.stack([V[i] for i in ids])
    lo, hi = M.min(axis=0), M.max(axis=0)
    su = 0
    for j in range(_HOP_M):
        pv = np.array(
            [
                math.floor(
                    lo[a - 1]
                    + ((2654435761 * (j * _EMB_D + a) + 12345) % _P)
                    / _P
                    * (hi[a - 1] - lo[a - 1])
                    + 0.5
                )
                for a in range(1, _EMB_D + 1)
            ],
            dtype=np.int64,
        )
        d2 = ((M - pv) ** 2).sum(axis=1).min()
        su += math.floor(math.sqrt(d2) + 0.5)
    sw = 0
    for sid in sorted(ids)[:_HOP_M]:
        best = None
        for other in ids:
            if other == sid:
                continue
            d2 = int(((V[sid] - V[other]) ** 2).sum())
            best = d2 if best is None else min(best, d2)
        sw += math.floor(math.sqrt(best) + 0.5)
    [r] = q_hopkins(spark, sf_dir).collect()
    assert r.m == _HOP_M
    assert abs(r.hopkins - round(su / (su + sw), 6)) < 1e-9
    assert 0 < r.hopkins < 1


def test_dunn_index_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext206 import (
        _SCALE,
        q_dunn_index,
    )

    ids, labels, V = _eint(spark, sf_dir, _SCALE)
    min_inter2 = max_intra2 = None
    arr = sorted(ids)
    M = np.stack([V[i] for i in arr])
    lab = np.array([labels[i] for i in arr])
    for i in range(len(arr)):
        d2 = ((M[i + 1:] - M[i]) ** 2).sum(axis=1)
        same = lab[i + 1:] == lab[i]
        if same.any():
            mi = int(d2[same].max())
            max_intra2 = mi if max_intra2 is None else max(max_intra2, mi)
        if (~same).any():
            mo = int(d2[~same].min())
            min_inter2 = mo if min_inter2 is None else min(min_inter2, mo)
    [r] = q_dunn_index(spark, sf_dir).collect()
    assert r.n == len(arr)
    assert r.n_labels == len(set(lab))
    assert abs(r.min_inter - round(math.sqrt(min_inter2) / _SCALE, 6)) < 1e-9
    assert abs(r.max_intra - round(math.sqrt(max_intra2) / _SCALE, 6)) < 1e-9
    assert abs(
        r.dunn - round(math.sqrt(min_inter2) / math.sqrt(max_intra2), 6)
    ) < 1e-9
    assert r.dunn > 0


def test_loocv_1nn_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext205 import _HG_K
    from arrow_supercluster_spark.plans.registry_ext206 import (
        q_loocv_1nn,
    )
    from arrow_supercluster_spark.plans.registry_ext import _emb

    rows = _emb(spark, sf_dir).select(
        "vec_id", "label", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    labels = {r.vec_id: r.label for r in rows}
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)
    per_label = {}
    for i, vid in enumerate(ids):
        cand = sorted(
            ((-S[i, j], ids[j]) for j in range(len(ids)) if j != i)
        )
        nn = cand[0][1]
        lab = labels[vid]
        n, c = per_label.get(lab, (0, 0))
        per_label[lab] = (n + 1, c + (1 if labels[nn] == lab else 0))
    got = {r.label: r for r in q_loocv_1nn(spark, sf_dir).collect()}
    assert sorted(got) == sorted(per_label)
    total_n = total_c = 0
    for lab, (n, c) in per_label.items():
        r = got[lab]
        assert (r.n, r.correct) == (n, c)
        assert abs(r.accuracy - round(c / n, 6)) < 1e-9
        total_n += n
        total_c += c
    # synthetic labels are random: overall accuracy sits in the
    # chance neighborhood, far from perfect separation
    assert 0 <= total_c / total_n < 0.5
