"""Batch-137 tests: meta-analysis, 2-D PCA, TOST — python oracles +
algebraic identities."""

import math
from collections import Counter, defaultdict


def test_meta_analysis_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext142 import (
        _MA_SCALE,
        q_meta_analysis,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_meta_analysis(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    cells = defaultdict(list)
    for e in ev:
        if e.event_type in ("click", "purchase"):
            cells[((e.ts.day - 1) // 7, e.event_type)].append(
                round(e.value * 100)
            )

    def mom(v):
        n, s, q = len(v), sum(v), sum(x * x for x in v)
        return n, s, q

    weeks = sorted({w for w, _ in cells})
    sw = swe = swe2 = 0
    k = 0
    for w in weeks:
        if (w, "click") not in cells or (w, "purchase") not in cells:
            continue
        na, sa, qa = mom(cells[(w, "click")])
        nb, sb, qb = mom(cells[(w, "purchase")])
        eff = sa / (100.0 * na) - sb / (100.0 * nb)
        var = ((qa - sa * sa / na) / (10000.0 * (na - 1))) / na + (
            (qb - sb * sb / nb) / (10000.0 * (nb - 1))
        ) / nb
        k += 1
        sw += round(1.0 / var * _MA_SCALE)
        swe += round(eff / var * _MA_SCALE)
        swe2 += round(eff * eff / var * _MA_SCALE)
    pooled = swe / sw
    q_stat = (swe2 - swe * swe / sw) / _MA_SCALE
    i2 = max(q_stat - (k - 1), 0.0) / q_stat if q_stat else None
    assert r.n_studies == k
    assert abs(r.pooled_effect - round(pooled, 4)) < 1e-9
    assert abs(r.pooled_se - round(math.sqrt(_MA_SCALE / sw), 4)) < 1e-9
    assert abs(r.cochran_q - round(q_stat, 4)) < 1e-9
    assert abs(r.i_squared - round(i2, 4)) < 1e-9
    assert 0.0 <= r.i_squared <= 1.0


def test_pca_2d_python_oracle_and_numpy(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext142 import q_pca_2d

    [r] = q_pca_2d(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user = defaultdict(lambda: [0, 0])
    for e in ev:
        u = per_user[e.user_id]
        if e.event_type == "click":
            u[0] += 1
        if e.event_type == "purchase":
            u[1] += round(e.value * 100)
    xs = [x for x, _ in per_user.values()]
    ys = [y for _, y in per_user.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    cxx = (sum(x * x for x in xs) - sx * sx / n) / (n - 1)
    cyy = (sum(y * y for y in ys) - sy * sy / n) / (n - 1)
    cxy = (
        sum(x * y for x, y in zip(xs, ys)) - sx * sy / n
    ) / (n - 1)
    disc = math.sqrt((cxx - cyy) ** 2 / 4 + cxy**2)
    l1 = (cxx + cyy) / 2 + disc
    l2 = (cxx + cyy) / 2 - disc
    assert r.n_users == n
    assert abs(r.lambda1 - round(l1, 4)) < 1e-6
    assert abs(r.lambda2 - round(l2, 4)) < 1e-6
    assert abs(r.explained_ratio - round(l1 / (l1 + l2), 6)) < 1e-9
    assert abs(
        r.correlation - round(cxy / math.sqrt(cxx * cyy), 6)
    ) < 1e-9
    # numpy eigen cross-check
    import numpy as np

    w, _ = np.linalg.eigh(np.array([[cxx, cxy], [cxy, cyy]]))
    assert abs(r.lambda1 - w[1]) < 1e-2
    assert abs(r.lambda2 - w[0]) < 1e-2
    # trace identity: lambda1 + lambda2 = cxx + cyy
    assert abs((r.lambda1 + r.lambda2) - (cxx + cyy)) < 1e-2


def test_tost_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext142 import (
        _TOST_MARGIN,
        _TOST_Z,
        q_tost_equivalence,
    )

    [r] = q_tost_equivalence(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    g = defaultdict(list)
    for e in ev:
        if e.event_type in ("click", "view"):
            g[e.event_type].append(round(e.value * 100))
    na, sa = len(g["click"]), sum(g["click"])
    qa = sum(x * x for x in g["click"])
    nb, sb = len(g["view"]), sum(g["view"])
    qb = sum(x * x for x in g["view"])
    diff = sa / (100.0 * na) - sb / (100.0 * nb)
    pooled = (sa + sb) / (100.0 * (na + nb))
    se = math.sqrt(
        ((qa - sa * sa / na) / (10000.0 * (na - 1))) / na
        + ((qb - sb * sb / nb) / (10000.0 * (nb - 1))) / nb
    )
    margin = _TOST_MARGIN * pooled
    t_lo = (diff + margin) / se
    t_hi = (diff - margin) / se
    assert abs(r.diff - round(diff, 4)) < 1e-9
    assert abs(r.margin - round(margin, 4)) < 1e-9
    assert abs(r.t_lower - round(t_lo, 4)) < 1e-9
    assert abs(r.t_upper - round(t_hi, 4)) < 1e-9
    assert r.equivalent == (t_lo > _TOST_Z and t_hi < -_TOST_Z)
    # consistency: equivalence requires the diff inside the margin
    if r.equivalent:
        assert abs(r.diff) < r.margin
