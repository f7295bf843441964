"""Batch-122 tests: Wasserstein-1, A/B power, embedding drift —
python oracles + metric properties."""

import math
from collections import Counter, defaultdict


def test_wasserstein_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext127 import (
        q_wasserstein_1d,
    )

    [r] = q_wasserstein_1d(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    a = sorted(
        round(e.value * 100) for e in ev if e.event_type == "click"
    )
    b = sorted(
        round(e.value * 100) for e in ev if e.event_type == "purchase"
    )
    na, nb = len(a), len(b)
    support = sorted(set(a) | set(b))
    ca = Counter(a)
    cb = Counter(b)
    cuma = cumb = 0
    total = 0
    for x, xn in zip(support, support[1:]):
        cuma += ca[x]
        cumb += cb[x]
        total += abs(cuma * nb - cumb * na) * (xn - x)
    w1 = total / (na * nb * 100.0)
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.w1_distance - round(w1, 6)) < 1e-9
    # scipy cross-check when available
    try:
        from scipy.stats import wasserstein_distance
    except ImportError:
        return
    w_sp = wasserstein_distance(
        [x / 100.0 for x in a], [x / 100.0 for x in b]
    )
    assert abs(r.w1_distance - w_sp) < 1e-4


def test_ab_power_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext127 import (
        _PW_Z_ALPHA,
        _PW_Z_BETA,
        q_ab_power,
    )

    [r] = q_ab_power(spark, sf_dir).collect()
    cents = [
        round(e.value * 100)
        for e in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if e.event_type == "click"
    ]
    n = len(cents)
    sc, ssq = sum(cents), sum(c * c for c in cents)
    mean = sc / (100.0 * n)
    sigma = math.sqrt((ssq - sc * sc / n) / (10000.0 * (n - 1)))
    delta = 0.05 * mean
    zsum = _PW_Z_ALPHA + _PW_Z_BETA
    n_arm = math.ceil(2.0 * sigma * sigma * zsum * zsum / (delta * delta))
    assert r.n_current == n
    assert abs(r.mean_v - round(mean, 4)) < 1e-9
    assert abs(r.sigma - round(sigma, 4)) < 1e-9
    assert r.n_per_arm == n_arm
    assert r.adequately_powered == (n >= 2 * n_arm)
    assert r.n_per_arm > 0


def test_embedding_drift_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext127 import (
        _DRIFT_SCALE,
        _DRIFT_TOP,
        q_embedding_drift,
    )

    got = q_embedding_drift(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    comps = defaultdict(lambda: defaultdict(list))
    for e in emb:
        for i, v in enumerate(e.embedding):
            comps[i][e.vec_id % 2].append(float(v))
    rows = []
    sq_sum = 0
    for pos, grp in comps.items():
        st = {}
        for g, vs in grp.items():
            n = len(vs)
            m = sum(vs) / n
            sd = math.sqrt(sum((x - m) ** 2 for x in vs) / (n - 1))
            st[g] = (n, round(m, 6), round(sd, 6))
        (n0, mu0, sd0), (n1, mu1, sd1) = st[0], st[1]
        z = (mu1 - mu0) / math.sqrt(sd0**2 / n0 + sd1**2 / n1)
        sq_sum += round((mu1 - mu0) ** 2 * _DRIFT_SCALE)
        rows.append((pos, mu0, mu1, round(z, 4)))
    l2 = round(math.sqrt(sq_sum / _DRIFT_SCALE), 6)
    rows.sort(key=lambda t: (-abs(t[3]), t[0]))
    want = rows[:_DRIFT_TOP]
    assert len(got) == _DRIFT_TOP
    for r, (pos, mu0, mu1, z) in zip(got, want):
        assert r.pos == pos
        assert abs(r.mu_ref - mu0) < 2e-6
        assert abs(r.mu_cur - mu1) < 2e-6
        assert abs(r.drift_z - z) < 2e-3  # python naive mean vs engine agg
        assert abs(r.centroid_l2 - l2) < 2e-4
    # parity split of i.i.d. synthetic vectors: no dimension should show
    # an extreme drift z
    assert all(abs(r.drift_z) < 6 for r in got)
