"""Batch-203 tests: Nelson-Aalen replay + exp(-H) >= KM bound, RMST
step-integration replay, seasonality-strength replay + bounds."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math

from pyspark.sql import functions as F


def _lifetimes(spark, sf_dir, churn_days):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .collect()
    )
    horizon = max(r.last_us for r in rows)
    out = []
    for r in rows:
        t = math.floor((r.last_us - r.first_us) / 86400000000.0)
        died = 1 if r.last_us < horizon - churn_days * 86400000000 else 0
        out.append((r.user_id, r.user_id % 2, t, died))
    return out


def _risk_table(life):
    agg = {}
    for _, _, t, d in life:
        rec = agg.setdefault(t, [0, 0])
        rec[0] += d
        rec[1] += 1
    risk = {}
    for t in agg:
        at_risk = sum(l for tt, (_, l) in agg.items() if tt >= t)
        risk[t] = (agg[t][0], at_risk)
    return risk


def test_nelson_aalen_matches_replay_and_bounds_km(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext208 import (
        _KM_CHURN_DAYS,
        q_nelson_aalen,
    )

    life = _lifetimes(spark, sf_dir, _KM_CHURN_DAYS)
    risk = _risk_table(life)
    got = {r.t_days: r for r in q_nelson_aalen(spark, sf_dir).collect()}
    assert sorted(got) == sorted(risk)
    for t in sorted(risk):
        h = sum(d / n for tt, (d, n) in risk.items() if tt <= t)
        se = math.sqrt(
            sum(d / (n * n) for tt, (d, n) in risk.items() if tt <= t)
        )
        r = got[t]
        assert (r.d, r.at_risk) == risk[t]
        assert abs(r.na_cumhaz - round(h, 6)) < 1e-9
        assert abs(r.na_se - round(se, 6)) < 1e-9
        # Fleming-Harrington exp(-H) dominates KM pointwise
        km = 1.0
        for tt in sorted(risk):
            if tt <= t:
                d, n = risk[tt]
                if 0 < d < n:
                    km *= 1 - d / n
        assert math.exp(-h) >= km - 1e-12


def test_rmst_matches_step_integration(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext208 import (
        _KM_CHURN_DAYS,
        _RMST_TAU,
        q_rmst,
    )

    life = _lifetimes(spark, sf_dir, _KM_CHURN_DAYS)
    got = {r.arm: r for r in q_rmst(spark, sf_dir).collect()}
    for arm in (0, 1):
        sub = [(t, d) for _, a, t, d in life if a == arm]
        agg = {}
        for t, d in sub:
            rec = agg.setdefault(t, [0, 0])
            rec[0] += d
            rec[1] += 1
        times = sorted(agg)
        surv = {}
        km = 1.0
        for t in times:
            d = agg[t][0]
            n = sum(l for tt, (_, l) in agg.items() if tt >= t)
            if 0 < d < n:
                km *= 1 - d / n
            surv[t] = km
        rmst = min(times[0], _RMST_TAU)  # S = 1 before the first time
        for i, t in enumerate(times):
            t_next = times[i + 1] if i + 1 < len(times) else _RMST_TAU
            rmst += surv[t] * (
                min(t_next, _RMST_TAU) - min(t, _RMST_TAU)
            )
        r = got[arm]
        assert r.n_users == len(sub)
        assert r.tau == _RMST_TAU
        assert abs(r.rmst - round(rmst, 4)) < 1e-6
        assert 0 <= r.rmst <= _RMST_TAU


def test_seasonality_strength_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext208 import (
        _SS_RADIUS,
        q_seasonality_strength,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    daily = sorted((r.d, r.x) for r in rows)
    trend = {}
    for d, x in daily:
        win = [xx for dd, xx in daily if abs((dd - d).days) <= _SS_RADIUS]
        trend[d] = sum(win) / len(win)
    by_wd = {}
    for d, x in daily:
        by_wd.setdefault(d.isoweekday(), []).append(x - trend[d])
    season = {wd: sum(v) / len(v) for wd, v in by_wd.items()}
    rs, trs, srs = [], [], []
    for d, x in daily:
        r = x - trend[d] - season[d.isoweekday()]
        rs.append(r)
        trs.append(trend[d] + r)
        srs.append(season[d.isoweekday()] + r)

    def var(v):
        n = len(v)
        return sum(x * x for x in v) / n - (sum(v) / n) ** 2

    ft = max(0.0, 1 - var(rs) / var(trs))
    fs = max(0.0, 1 - var(rs) / var(srs))
    [g] = q_seasonality_strength(spark, sf_dir).collect()
    assert g.n == len(daily)
    assert abs(g.trend_strength - round(ft, 6)) < 1e-6
    assert abs(g.seasonal_strength - round(fs, 6)) < 1e-6
    assert 0 <= g.trend_strength <= 1 and 0 <= g.seasonal_strength <= 1
