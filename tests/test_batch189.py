"""Batch-189 tests: Qini decile replay (NTILE semantics included),
Wald-IV replay, RDD closed-form OLS replay + side-fit invariants."""

import datetime

from pyspark.sql import functions as F


def _events(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    return read_events(spark, sf_dir)


def _ntile(idx, n, k):
    q, rem = divmod(n, k)
    if q == 0:
        return idx + 1
    big = q + 1
    head = rem * big
    return (idx // big if idx < head else rem + (idx - head) // q) + 1


def test_qini_uplift_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext194 import (
        _QU_CONV_MIN,
        _QU_DECILES,
        _QU_SPLIT,
        q_qini_uplift,
    )

    split = datetime.datetime.fromisoformat(_QU_SPLIT)
    rows = _events(spark, sf_dir).select(
        "user_id", "ts", "event_type", "value"
    ).collect()
    users = {}
    for r in rows:
        ts = r.ts.replace(tzinfo=None)
        s, y = users.get(r.user_id, (0, 0))
        if ts < split and r.event_type in ("click", "view"):
            s += 1
        if (
            ts >= split
            and r.event_type == "purchase"
            and r.value > _QU_CONV_MIN
        ):
            y = 1
        users[r.user_id] = (s, y)
    ordered = sorted(users.items(), key=lambda kv: (-kv[1][0], kv[0]))
    n = len(ordered)
    g = {d: [0, 0, 0, 0] for d in range(1, _QU_DECILES + 1)}
    for idx, (uid, (s, y)) in enumerate(ordered):
        d = _ntile(idx, n, _QU_DECILES)
        t = uid % 2
        g[d][0 if t == 1 else 1] += 1
        if y:
            g[d][2 if t == 1 else 3] += 1
    got = q_qini_uplift(spark, sf_dir).collect()
    assert [r.decile for r in got] == list(range(1, _QU_DECILES + 1))
    cy_t = cy_c = cn_t = cn_c = 0
    for r in got:
        n_t, n_c, y_t, y_c = g[r.decile]
        assert (r.n_t, r.n_c, r.conv_t, r.conv_c) == (n_t, n_c, y_t, y_c)
        if n_t and n_c:
            assert abs(r.uplift - round(y_t / n_t - y_c / n_c, 6)) < 1e-9
        cn_t += n_t
        cn_c += n_c
        cy_t += y_t
        cy_c += y_c
        if cn_c:
            assert (
                abs(r.cum_qini - round(cy_t - cy_c * cn_t / cn_c, 6))
                < 1e-9
            )
    # last decile's Qini is the overall incremental conversions
    assert got[-1].cum_qini is not None


def test_wald_iv_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext194 import (
        _P,
        q_wald_iv,
    )

    rows = _events(spark, sf_dir).select(
        "user_id", "event_type", "value"
    ).collect()
    users = {}
    for r in rows:
        ns, yc = users.get(r.user_id, (0, 0))
        if r.event_type == "signup":
            ns += 1
        if r.event_type == "purchase":
            yc += round(r.value * 100)
        users[r.user_id] = (ns, yc)
    g = {0: [0, 0, 0], 1: [0, 0, 0]}
    for uid, (ns, yc) in users.items():
        z = (uid * 2654435761 % _P) % 2
        d = (1 - z) if ns % 5 == 0 else z
        g[z][0] += 1
        g[z][1] += d
        g[z][2] += yc
    n0, nd0, sy0 = g[0]
    n1, nd1, sy1 = g[1]
    itt = (sy1 / n1 - sy0 / n0) / 100.0
    fs = nd1 / n1 - nd0 / n0
    [r] = q_wald_iv(spark, sf_dir).collect()
    assert (r.n0, r.n1) == (n0, n1)
    assert abs(r.itt - round(itt, 6)) < 1e-9
    assert abs(r.first_stage - round(fs, 6)) < 1e-9
    assert fs != 0 and abs(r.wald - round(itt / fs, 6)) < 1e-9


def test_rdd_estimator_matches_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext194 import (
        _RDD_BW,
        _RDD_CUT,
        q_rdd_estimator,
    )

    rows = (
        _events(spark, sf_dir)
        .select(
            (F.hour("ts") * 60 + F.minute("ts")).alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    sides = {0: [], 1: []}
    for r in rows:
        if abs(r.x - _RDD_CUT) < _RDD_BW:
            sides[1 if r.x >= _RDD_CUT else 0].append((r.x, r.y))
    fits = {}
    for s, pts in sides.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        yhat = (sy + slope * (_RDD_CUT * n - sx)) / n
        fits[s] = (n, slope, yhat)
    [r] = q_rdd_estimator(spark, sf_dir).collect()
    assert (r.n_l, r.n_r) == (fits[0][0], fits[1][0])
    assert abs(r.slope_left - round(fits[0][1], 6)) < 1e-9
    assert abs(r.slope_right - round(fits[1][1], 6)) < 1e-9
    assert abs(r.yhat_left - round(fits[0][2] / 100.0, 4)) < 1e-9
    assert abs(r.yhat_right - round(fits[1][2] / 100.0, 4)) < 1e-9
    assert (
        abs(r.effect - round((fits[1][2] - fits[0][2]) / 100.0, 4)) < 1e-9
    )
