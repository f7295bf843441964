"""Batch-216 tests: python replays of the survival completions
(log-rank, life table, Aalen-Johansen CIF) from raw events."""

import math

from pyspark.sql import functions as F


def _lifetimes(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext221 import _CHURN_DAYS
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("t0"),
            F.max(F.unix_micros("ts")).alias("t1"),
        )
        .collect()
    )
    horizon = max(r.t1 for r in rows)
    out = []
    for r in rows:
        t = (r.t1 - r.t0) // 86_400_000_000
        died = int(r.t1 < horizon - _CHURN_DAYS * 86_400_000_000)
        out.append((r.user_id % 2, int(t), died))
    return out


def test_logrank_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    life = _lifetimes(spark, sf_dir)
    times = sorted({t for _, t, d in life if d == 1})
    o_e = v = 0.0
    for tt in times:
        n = sum(1 for _, t, _ in life if t >= tt)
        n1 = sum(1 for g, t, _ in life if t >= tt and g == 1)
        d = sum(1 for _, t, dd in life if t == tt and dd == 1)
        d1 = sum(1 for g, t, dd in life if t == tt and dd == 1 and g == 1)
        o_e += d1 - d * (n1 / n)
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    row = REGISTRY["q_logrank"].spark(spark, sf_dir).collect()[0]
    assert row.n_death_times == len(times)
    assert abs(row.o_minus_e - o_e) < 1e-4
    assert abs(row.variance - v) < 1e-4
    if v > 0:
        assert abs(row.logrank_chi2 - o_e * o_e / v) < 1e-3
        assert row.logrank_chi2 >= 0
    else:  # no deaths in the window: chi2/z are NULL by contract
        assert row.logrank_chi2 is None and row.z is None


def test_life_table_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext221 import _LT_INTERVAL

    life = _lifetimes(spark, sf_dir)
    from collections import Counter

    d_iv, c_iv = Counter(), Counter()
    for _, t, died in life:
        (d_iv if died else c_iv)[t // _LT_INTERVAL] += 1
    ivs = sorted(set(d_iv) | set(c_iv))
    rows = {
        r.interval_idx: r
        for r in REGISTRY["q_life_table"].spark(spark, sf_dir).collect()
    }
    assert set(rows) == set(ivs)
    remaining = len(life)
    surv = 1.0
    for iv in ivs:
        d, c = d_iv[iv], c_iv[iv]
        r = rows[iv]
        assert r.n_enter == remaining
        assert (r.deaths, r.censored) == (d, c)
        expo = remaining - c / 2.0
        q = d / expo if expo > 0 else 0.0
        assert abs(r.cond_mortality - q) < 1e-6
        if 0 < q < 1:
            surv *= 1 - q
        assert abs(r.survival - surv) < 1e-5
        remaining -= d + c
    assert remaining == 0


def test_cif_replay_and_decomposition(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    rows = REGISTRY["q_cumulative_incidence"].spark(
        spark, sf_dir
    ).collect()
    assert rows
    prev_p = prev_e = 0.0
    for r in rows:
        # CIFs are nondecreasing and the decomposition closes:
        # CIF_p + CIF_e + S = 1 at every death time
        assert r.cif_purchase >= prev_p - 1e-9
        assert r.cif_error >= prev_e - 1e-9
        prev_p, prev_e = r.cif_purchase, r.cif_error
        total = r.cif_purchase + r.cif_error + r.event_free_survival
        assert abs(total - 1.0) < 1e-4, r
