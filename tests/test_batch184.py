"""Batch-184 tests: peak replay, ARCH LM vs closed form, DFT replay."""

import numpy as np
from pyspark.sql import functions as F


def _daily(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .select("event_type", F.to_date("ts").alias("day"))
        .collect()
    )
    by_t = {}
    for r in rows:
        by_t.setdefault(r.event_type, {}).setdefault(r.day, 0)
        by_t[r.event_type][r.day] += 1
    return {t: [v for _, v in sorted(d.items())] for t, d in by_t.items()}, {
        t: sorted(d) for t, d in by_t.items()
    }


def test_peak_detection_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext189 import (
        _PK_RADIUS,
        q_peak_detection,
    )

    series, days = _daily(spark, sf_dir)
    want = {}
    for t, ns in series.items():
        for i, n in enumerate(ns):
            lo, hi = max(0, i - _PK_RADIUS), min(len(ns), i + _PK_RADIUS + 1)
            hood = ns[lo:hi]
            others = hood[: i - lo] + hood[i - lo + 1:]
            if (
                0 < i < len(ns) - 1
                and n > ns[i - 1]
                and n > ns[i + 1]
                and n >= max(others)
            ):
                med = float(np.quantile(hood, 0.5))
                want[(t, days[t][i].isoformat())] = (n, round(n - med, 4))
    got = {
        (r.event_type, r.day): (r.n, r.height_above_median)
        for r in q_peak_detection(spark, sf_dir).collect()
    }
    assert got == want
    assert len(got) > 0


def test_arch_effect_matches_closed_form(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext189 import (
        q_arch_effect,
    )

    series, _ = _daily(spark, sf_dir)
    for r in q_arch_effect(spark, sf_dir).collect():
        ns = np.array(series[r.event_type], dtype=float)
        e2 = (ns - ns.mean()) ** 2
        x, y = e2[:-1], e2[1:]
        n = len(x)
        assert r.n == n
        sxy = n * (x * y).sum() - x.sum() * y.sum()
        sxx = n * (x * x).sum() - x.sum() ** 2
        syy = n * (y * y).sum() - y.sum() ** 2
        r2 = 0.0 if sxx * syy == 0 else sxy**2 / (sxx * syy)
        assert abs(r.r2 - r2) < 1e-5
        assert abs(r.lm_stat - n * r2) < 1e-4
        assert r.volatility_clustered == (n * r2 > 3.841)
        assert 0 <= r.r2 <= 1 + 1e-9


def test_spectral_peak_matches_dft_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext189 import (
        _SP_MAX_K,
        q_spectral_peak,
    )

    series, _ = _daily(spark, sf_dir)
    for r in q_spectral_peak(spark, sf_dir).collect():
        ns = np.array(series[r.event_type], dtype=float)
        e = ns - ns.mean()
        T = len(ns)
        tt = np.arange(T)
        powers = {}
        for k in range(1, _SP_MAX_K + 1):
            a = 2 * np.pi * k * tt / T
            powers[k] = (e * np.cos(a)).sum() ** 2 + (
                e * np.sin(a)
            ).sum() ** 2
        best = min(powers, key=lambda k: (-round(powers[k], 9), k))
        assert r.dominant_k == best
        assert abs(r.power - powers[best]) < max(1e-3, 1e-9 * powers[best])
        assert abs(r.period_days - T / best) < 1e-3
        assert abs(
            r.power_share - powers[best] / sum(powers.values())
        ) < 1e-5
        assert 0 < r.power_share <= 1
