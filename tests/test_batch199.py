"""Batch-199 tests: Holm/Hochberg step replays + dominance ordering,
generalized-ESD iteration replay, Hampel replay."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math

from pyspark.sql import functions as F


def _erf(x):
    # A&S 7.1.26 — same polynomial the queries share
    sign = 1 if x >= 0 else -1
    x = abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    y = 1.0 - (
        ((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
         - 0.284496736) * t + 0.254829592
    ) * t * math.exp(-x * x)
    return sign * y


def test_holm_adjust_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext204 import (
        _MT_ALPHA,
        q_holm_adjust,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.max(F.when(F.col("value") > 90, 1).otherwise(0)).alias("c"))
        .collect()
    )
    grp = {}
    for r in rows:
        n, k = grp.get(r.event_type, (0, 0))
        grp[r.event_type] = (n + 1, k + r.c)
    p0 = sum(k for _, k in grp.values()) / sum(n for n, _ in grp.values())
    pv = {}
    for t, (n, k) in grp.items():
        az = abs((k / n - p0) / math.sqrt(p0 * (1 - p0) / n))
        pv[t] = 2 * (1 - 0.5 * (1 + _erf(az / math.sqrt(2))))
    m = len(pv)
    order = sorted(pv, key=lambda t: (pv[t], t))
    rnk = {t: i + 1 for i, t in enumerate(order)}
    holm, hoch = {}, {}
    for t in pv:
        holm[t] = max(
            min(1.0, (m - rnk[b] + 1) * pv[b])
            for b in pv
            if rnk[b] <= rnk[t]
        )
        hoch[t] = min(
            min(1.0, (m - rnk[b] + 1) * pv[b])
            for b in pv
            if rnk[b] >= rnk[t]
        )
    got = {r.event_type: r for r in q_holm_adjust(spark, sf_dir).collect()}
    assert sorted(got) == sorted(pv)
    for t, r in got.items():
        assert abs(r.p_raw - round(pv[t], 8)) < 1e-9
        assert abs(r.p_bonferroni - round(min(1.0, m * pv[t]), 8)) < 1e-9
        assert abs(r.p_sidak - round(1 - (1 - pv[t]) ** m, 8)) < 1e-9
        assert abs(r.p_holm - round(holm[t], 8)) < 1e-9
        assert abs(r.p_hochberg - round(hoch[t], 8)) < 1e-9
        assert r.reject_holm == (holm[t] < _MT_ALPHA)
        assert r.reject_hochberg == (hoch[t] < _MT_ALPHA)
        # dominance: bonferroni >= holm >= hochberg >= raw
        assert (
            r.p_bonferroni >= r.p_holm >= r.p_hochberg >= r.p_raw - 1e-12
        )


def _daily_purchases(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    return sorted((r.d, r.x) for r in rows)


def test_seasonal_esd_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext204 import (
        _ESD_K,
        _ESD_Z,
        q_seasonal_esd,
    )

    daily = _daily_purchases(spark, sf_dir)
    # weekday median detrend (weekday key: python isoweekday groups the
    # same days as either engine's dow numbering)
    by_wd = {}
    for d, x in daily:
        by_wd.setdefault(d.isoweekday(), []).append(x)

    def median(vals):
        s = sorted(vals)
        n = len(s)
        mid = n // 2
        return float(s[mid]) if n % 2 else (s[mid - 1] + s[mid]) / 2.0

    med = {wd: median(vs) for wd, vs in by_wd.items()}
    resid = {d: x - med[d.isoweekday()] for d, x in daily}
    xval = dict(daily)
    want = []
    for i in range(1, _ESD_K + 1):
        n = len(resid)
        mu = sum(resid.values()) / n
        var = sum((r - mu) ** 2 for r in resid.values()) / (n - 1)
        sd = math.sqrt(var)
        cand = max(resid, key=lambda d: (abs(resid[d] - mu) / sd, ))
        # earliest-day tiebreak
        best = abs(resid[cand] - mu) / sd
        cands = [d for d in resid if abs(abs(resid[d] - mu) / sd - best) < 1e-15]
        cand = min(cands)
        z = abs(resid[cand] - mu) / sd
        want.append((i, cand.isoformat(), xval[cand], round(z, 4), z > _ESD_Z))
        del resid[cand]
    got = [
        (r.iteration, r.day, r.x, r.z, r.significant)
        for r in q_seasonal_esd(spark, sf_dir).collect()
    ]
    assert got == want


def test_hampel_filter_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext204 import (
        _HF_K,
        _HF_RADIUS,
        _HF_SCALE,
        q_hampel_filter,
    )

    daily = _daily_purchases(spark, sf_dir)

    def q50(vals):
        s = sorted(vals)
        n = len(s)
        mid = n // 2
        return float(s[mid]) if n % 2 else (s[mid - 1] + s[mid]) / 2.0

    got = {r.day: r for r in q_hampel_filter(spark, sf_dir).collect()}
    assert len(got) == len(daily)
    n_out = 0
    for d, x in daily:
        win = [
            xx for dd, xx in daily if abs((dd - d).days) <= _HF_RADIUS
        ]
        med = q50(win)
        mad = q50([abs(xx - med) for xx in win])
        r = got[d.isoformat()]
        assert r.x == x
        assert abs(r.med - round(med, 4)) < 1e-9
        assert abs(r.mad - round(mad, 4)) < 1e-9
        flag = abs(x - med) > _HF_K * _HF_SCALE * mad
        assert r.is_outlier == flag
        n_out += flag
    # the filter is a screen, not a shredder: it keeps most days
    assert n_out < len(daily) / 2
