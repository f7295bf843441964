"""Batch-136 tests: Taylor's law, Allan variance, matrix profile —
python oracles + law/profile properties."""

import math
from collections import Counter, defaultdict


def test_taylors_law_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext141 import (
        _TL_SCALE,
        q_taylors_law,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_taylors_law(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    uw = Counter((e.user_id, (e.ts.day - 1) // 7) for e in ev)
    weeks = sorted({w for _, w in uw})
    users = sorted({u for u, _ in uw})
    pts = []
    for u in users:
        cs = [uw.get((u, w), 0) for w in weeks]
        k = len(cs)
        s, ssq = sum(cs), sum(c * c for c in cs)
        var = (ssq - s * s / k) / (k - 1)
        if s > 0 and var > 0:
            pts.append(
                (
                    round(math.log(s / k) * _TL_SCALE),
                    round(math.log(var) * _TL_SCALE),
                )
            )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(round(x * y / _TL_SCALE) for x, y in pts)
    sxx = sum(round(x * x / _TL_SCALE) for x, _ in pts)
    b = (sxy - sx * sy / (_TL_SCALE * n)) / (sxx - sx * sx / (_TL_SCALE * n))
    a = math.exp(
        sy / (_TL_SCALE * n) - b * sx / (_TL_SCALE * n)
    )
    assert r.n_users == n
    assert abs(r.taylor_b - round(b, 6)) < 1e-9
    assert abs(r.taylor_a - round(a, 6)) < 1e-9
    # fluctuation scaling lands in the canonical band
    assert 0.0 < r.taylor_b < 3.0


def test_allan_variance_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext141 import (
        _AV_TAUS,
        q_allan_variance,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.tau: r for r in q_allan_variance(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day - 1 for e in ev)
    mx = max(daily)
    series = [daily.get(d, 0) for d in range(mx + 1)]
    for tau in _AV_TAUS:
        means = []
        for b0 in range(0, len(series) - tau + 1, tau):
            blk = series[b0 : b0 + tau]
            if len(blk) == tau:
                means.append(sum(blk) / tau)
        diffs = [
            (means[i + 1] - means[i]) ** 2 for i in range(len(means) - 1)
        ]
        av = 0.5 * sum(diffs) / len(diffs)
        r = got[tau]
        assert r.n_pairs == len(diffs)
        assert abs(r.allan_var - round(av, 4)) < 1e-9
        assert r.allan_var >= 0


def test_matrix_profile_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext141 import (
        _MP_SCALE,
        _MP_W,
        q_matrix_profile,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.start: r for r in q_matrix_profile(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day - 1 for e in ev)
    mx = max(daily)
    series = [float(daily.get(d, 0)) for d in range(mx + 1)]
    n = len(series)

    def znorm(i):
        w = series[i : i + _MP_W]
        m = sum(w) / _MP_W
        sd = max(math.sqrt(sum((x - m) ** 2 for x in w) / _MP_W), 1e-9)
        return [(x - m) / sd for x in w]

    starts = list(range(n - _MP_W + 1))
    zs = {i: znorm(i) for i in starts}
    prof = {}
    for i in starts:
        best = None
        for j in starts:
            if abs(i - j) < _MP_W:
                continue
            d = round(
                math.sqrt(
                    sum((a - b) ** 2 for a, b in zip(zs[i], zs[j]))
                )
                * _MP_SCALE
            )
            best = d if best is None else min(best, d)
        if best is not None:
            prof[i] = best
    mn, mxv = min(prof.values()), max(prof.values())
    assert set(got) == set(prof)
    for i, nn in prof.items():
        r = got[i]
        assert abs(r.nn_dist - round(nn / _MP_SCALE, 6)) < 1e-9
        assert r.is_motif == (nn == mn)
        assert r.is_discord == (nn == mxv)
    # a motif and a discord both exist and differ
    assert any(r.is_motif for r in got.values())
    assert any(r.is_discord for r in got.values())
