"""Batch-171 tests: python replays of the Theta forecast, power
analysis, and regression metrics."""

import collections
import math


def test_theta_forecast_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext176 import (
        _TH_ALPHA,
        q_theta_forecast,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = {r.h: r for r in q_theta_forecast(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    ev = read_events(spark, sf_dir).collect()
    daily = collections.Counter(
        e.ts.date() for e in ev if e.event_type == "purchase"
    )
    y = [float(daily[d]) for d in sorted(daily)]
    n = len(y)
    t = list(range(1, n + 1))
    sty = sum(a * b for a, b in zip(t, y))
    st, sy = sum(t), sum(y)
    stt = sum(a * a for a in t)
    b = (sty - st * sy / n) / (stt - st * st / n)
    a = sy / n - b * st / n
    level = 0.0
    for j, yj in zip(t, y):
        th2 = 2.0 * yj - (a + b * j)
        w = (
            (1 - _TH_ALPHA) ** (n - 1)
            if j == 1
            else _TH_ALPHA * (1 - _TH_ALPHA) ** (n - j)
        )
        level += w * th2
    for h in (1, 2, 3):
        r = rows[h]
        want = 0.5 * (a + b * (n + h)) + 0.5 * level
        assert abs(r.forecast - want) < 1e-4
        assert abs(r.trend_a - round(a, 6)) < 1e-6
        assert abs(r.trend_b - round(b, 6)) < 1e-6
        assert abs(r.ses_level - round(level, 6)) < 1e-4
    # horizon moves the forecast by the trend slope
    assert abs(
        (rows[2].forecast - rows[1].forecast) - 0.5 * b
    ) < 1e-4


def test_power_analysis_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext176 import (
        _PA_DELTAS,
        q_power_analysis,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    rows = {r.mde: r for r in q_power_analysis(spark, sf_dir).collect()}
    assert set(rows) == set(_PA_DELTAS)
    ev = read_events(spark, sf_dir).collect()
    p1 = sum(1 for e in ev if e.event_type == "purchase") / len(ev)
    # z constants (true normal quantiles; BSM is accurate to ~1e-7)
    za, zb = 1.959963985, 0.841621234
    for d in _PA_DELTAS:
        r = rows[d]
        assert abs(r.baseline_rate - round(p1, 6)) < 1e-9
        p2 = p1 + d
        pbar = (p1 + p2) / 2
        want = math.ceil(
            (za * math.sqrt(2 * pbar * (1 - pbar))
             + zb * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))) ** 2
            / (d * d)
        )
        assert abs(r.n_per_arm - want) <= 1  # BSM vs exact z rounding
    # smaller effects need more samples
    ns = [rows[d].n_per_arm for d in sorted(_PA_DELTAS)]
    assert ns == sorted(ns, reverse=True)


def test_regression_metrics_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext176 import (
        _RM_B0,
        _RM_B1,
        q_regression_metrics,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    r = q_regression_metrics(spark, sf_dir).collect()[0]
    ev = [
        e
        for e in read_events(spark, sf_dir).collect()
        if e.event_type == "purchase" and e.value is not None and e.value > 0
    ]
    y = [e.value for e in ev]
    yhat = [_RM_B0 + _RM_B1 * e.ts.hour for e in ev]
    nn = len(y)
    ybar = sum(y) / nn
    sse = sum((a - b) ** 2 for a, b in zip(y, yhat))
    sst = sum((a - ybar) ** 2 for a in y)
    assert r.n == nn
    assert abs(r.rmse - round(math.sqrt(sse / nn), 6)) < 1e-5
    assert abs(
        r.mae - round(sum(abs(a - b) for a, b in zip(y, yhat)) / nn, 6)
    ) < 1e-5
    assert abs(r.r2 - round(1 - sse / sst, 6)) < 1e-5
    assert abs(
        r.mape
        - round(sum(abs(a - b) / a for a, b in zip(y, yhat)) / nn, 6)
    ) < 1e-5
    # the stated fixed predictor is a diagnostic, not a fit
    assert r.r2 < 0.5
