"""Batch-146 tests: cluster-validity indices vs sklearn, NMI vs
sklearn/metrics with geometric normalization."""

import numpy as np


def _xy(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    X = np.array([[float(v) for v in r.embedding] for r in rows])
    y = np.array([r.label for r in rows])
    return X, y


def test_calinski_harabasz_matches_sklearn(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext151 import (
        q_calinski_harabasz,
    )

    r = q_calinski_harabasz(spark, sf_dir).collect()[0]
    X, y = _xy(spark, sf_dir)
    assert r.n == len(X) and r.k == len(set(y))
    # independent numpy oracle
    gc = X.mean(axis=0)
    w = b = 0.0
    for lab in set(y):
        pts = X[y == lab]
        c = pts.mean(axis=0)
        w += ((pts - c) ** 2).sum()
        b += len(pts) * ((c - gc) ** 2).sum()
    ch = (b / (r.k - 1)) / (w / (r.n - r.k))
    assert abs(r.between_ss - b) < 1e-2
    assert abs(r.within_ss - w) < 1e-2
    assert abs(r.calinski_harabasz - ch) < max(1e-3, ch * 1e-5)
    try:
        from sklearn.metrics import calinski_harabasz_score
    except ImportError:
        return
    assert abs(
        r.calinski_harabasz - calinski_harabasz_score(X, y)
    ) < max(1e-3, r.calinski_harabasz * 1e-5)


def test_davies_bouldin_matches_sklearn(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext151 import (
        q_davies_bouldin,
    )

    rows = q_davies_bouldin(spark, sf_dir).collect()
    X, y = _xy(spark, sf_dir)
    labs = sorted(set(y))
    assert [r.label for r in rows] == labs
    cents = {l: X[y == l].mean(axis=0) for l in labs}
    s = {
        l: np.linalg.norm(X[y == l] - cents[l], axis=1).mean()
        for l in labs
    }
    max_r = {}
    for i in labs:
        max_r[i] = max(
            (s[i] + s[j]) / np.linalg.norm(cents[i] - cents[j])
            for j in labs
            if j != i
        )
    db = np.mean(list(max_r.values()))
    for r in rows:
        assert abs(r.s_intra - s[r.label]) < 1e-3
        assert abs(r.max_r - max_r[r.label]) < 1e-3
        assert abs(r.davies_bouldin - db) < 1e-3
    try:
        from sklearn.metrics import davies_bouldin_score
    except ImportError:
        return
    assert abs(rows[0].davies_bouldin - davies_bouldin_score(X, y)) < 1e-3


def test_nmi_matches_sklearn_geometric(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext151 import (
        q_nmi_clustering,
    )

    r = q_nmi_clustering(spark, sf_dir).collect()[0]
    X, y = _xy(spark, sf_dir)
    pred = []
    for v in X[:, :4]:
        if v[0] >= v[1] and v[0] >= v[2] and v[0] >= v[3]:
            pred.append(1)
        elif v[1] >= v[2] and v[1] >= v[3]:
            pred.append(2)
        elif v[2] >= v[3]:
            pred.append(3)
        else:
            pred.append(4)
    pred = np.array(pred)
    assert r.n == len(X)
    assert 0.0 <= r.nmi <= 1.0
    try:
        from sklearn.metrics import normalized_mutual_info_score
    except ImportError:
        return
    sk = normalized_mutual_info_score(y, pred, average_method="geometric")
    assert abs(r.nmi - sk) < 1e-4


def test_nmi_extremes(spark, tmp_path):
    """NMI = 1 when the pseudo-clustering reproduces the labels exactly
    (labels constructed so dim argmax == label)."""
    from arrow_supercluster_spark.plans.registry_ext151 import (
        q_nmi_clustering,
    )

    rows = []
    for i in range(40):
        lab = i % 4 + 1
        v = [0.0] * 64
        v[lab - 1] = 5.0
        v[10] = float(i % 7)  # irrelevant variation
        rows.append((i, [float(x) for x in v], lab))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    r = q_nmi_clustering(spark, str(tmp_path)).collect()[0]
    assert abs(r.nmi - 1.0) < 1e-9
