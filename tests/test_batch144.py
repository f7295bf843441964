"""Batch-144 tests: Hoeffding certificate, McNemar, Cook's distance —
python oracles + guarantee checks."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import Counter, defaultdict

_P = 2147483647


def test_hoeffding_certificate_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext149 import (
        _HC_DELTA,
        q_hoeffding_certificate,
    )

    [r] = q_hoeffding_certificate(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cents = [
        (round(e.value * 100),
         ((e.event_id % _P) * 2654435761 + 12345) % _P % 10 == 0)
        for e in ev
        if e.event_type == "purchase"
    ]
    full = [c for c, _ in cents]
    samp = [c for c, s in cents if s]
    tm = sum(full) / (100.0 * len(full))
    sm = sum(samp) / (100.0 * len(samp))
    eps = (max(full) - min(full)) / 100.0 * math.sqrt(
        math.log(2.0 / _HC_DELTA) / (2.0 * len(samp))
    )
    assert (r.n_full, r.n_sample) == (len(full), len(samp))
    assert abs(r.true_mean - round(tm, 4)) < 1e-9
    assert abs(r.sample_mean - round(sm, 4)) < 1e-9
    assert abs(r.actual_error - round(abs(sm - tm), 4)) < 1e-9
    assert abs(r.hoeffding_eps - round(eps, 4)) < 1e-9
    assert r.within_bound == (abs(sm - tm) <= eps)
    # Hoeffding must be conservative on this sample (and the sample
    # a genuine ~10%)
    assert r.within_bound
    assert 0.03 < r.n_sample / r.n_full < 0.25


def test_mcnemar_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext149 import q_mcnemar
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_mcnemar(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    seqs = defaultdict(list)
    for e in ev:
        seqs[e.user_id].append((e.ts, e.event_id, e.event_type))
    train_c = defaultdict(Counter)
    train_marg = Counter()
    test_pairs = []
    for u, rows in seqs.items():
        rows.sort()
        for (_, _, cur), (_, _, nxt) in zip(rows, rows[1:]):
            if u % 2 == 1:
                train_c[cur][nxt] += 1
                train_marg[nxt] += 1
            else:
                test_pairs.append((cur, nxt))
    model = {
        cur: sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        for cur, cnts in train_c.items()
    }
    maj = sorted(train_marg.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    b = c = 0
    for cur, nxt in test_pairs:
        if cur not in model:
            continue
        m_ok = model[cur] == nxt
        j_ok = maj == nxt
        if m_ok and not j_ok:
            b += 1
        elif j_ok and not m_ok:
            c += 1
    chi2 = (abs(b - c) - 1.0) ** 2 / (b + c) if b + c else None
    assert (r.b_markov_only, r.c_majority_only) == (b, c)
    if chi2 is not None:
        assert abs(r.mcnemar_chi2 - round(chi2, 4)) < 1e-9
    assert r.markov_better == (b > c)


def test_cooks_distance_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext149 import (
        _CD_TOP,
        q_cooks_distance,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = [
        (r.day, r.residual, r.leverage, r.cooks_d)
        for r in q_cooks_distance(spark, sf_dir).collect()
    ]
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day for e in ev)
    pts = sorted(daily.items())
    n = len(pts)
    sx = sum(d for d, _ in pts)
    sy = sum(c for _, c in pts)
    sxy = sum(d * c for d, c in pts)
    sxx = sum(d * d for d, _ in pts)
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    b0 = sy / n - slope * sx / n
    xbar = sx / n
    sxx_c = sxx - sx * sx / n
    rows = []
    es = []
    for d, c in pts:
        e = c - (b0 + slope * d)
        es.append(e)
    s2 = sum(e * e for e in es) / (n - 2)
    for (d, c), e in zip(pts, es):
        h = 1.0 / n + (d - xbar) ** 2 / sxx_c
        cd = e * e * h / (2.0 * s2 * (1.0 - h) ** 2)
        rows.append((d, round(e, 4), round(h, 6), round(cd, 6)))
    rows.sort(key=lambda t: (-t[3], t[0]))
    assert got == rows[:_CD_TOP]
    # leverage is largest at the calendar ends (the hat-matrix shape)
    max_lev_day = max(rows, key=lambda t: t[2])[0]
    assert max_lev_day in (pts[0][0], pts[-1][0])
