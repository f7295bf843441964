"""Batch-150 tests: Harrell's C vs a brute-force pair scan (and
lifelines-style semantics), Brier decomposition identity, Theil's U2
python oracle."""

import numpy as np


def test_harrell_c_bruteforce(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext155 import (
        _HC_CHURN_DAY,
        q_harrell_c,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_harrell_c(spark, sf_dir).collect()[0]
    d = F.dayofmonth("ts")
    users = (
        read_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            (F.max(d) - F.min(d)).alias("dur"),
            (F.max(d) < _HC_CHURN_DAY).cast("int").alias("ch"),
            F.sum(F.when(d <= 10, 1).otherwise(0)).alias("risk"),
        )
        .collect()
    )
    conc = comp = 0.0
    for a in users:
        if not a.ch:
            continue
        for b in users:
            if a.dur < b.dur:
                comp += 1
                if a.risk > b.risk:
                    conc += 1
                elif a.risk == b.risk:
                    conc += 0.5
    assert r.n_users == len(users)
    assert r.n_comparable == comp > 0
    assert abs(r.harrell_c - conc / comp) < 1e-6  # query rounds to 6dp
    assert 0 <= r.harrell_c <= 1


def test_brier_decomposition_identity_and_raw(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext155 import (
        _BD_BINS,
        _H_MOD,
        _H_MULT,
        q_brier_decomposition,
    )
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_brier_decomposition(spark, sf_dir).collect()[0]
    users = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 90),
                    1,
                ).otherwise(0)
            ).alias("y")
        )
        .collect()
    )
    p = np.array([(u.user_id * _H_MULT) % _H_MOD for u in users]) / _H_MOD
    y = np.array([u.y for u in users], float)
    assert r.n_users == len(users)
    assert abs(r.brier_raw - ((p - y) ** 2).mean()) < 1e-5
    b = np.floor(p * _BD_BINS).astype(int)
    rel = res = 0.0
    obar = y.mean()
    for k in set(b):
        m = b == k
        rel += m.sum() * (p[m].mean() - y[m].mean()) ** 2
        res += m.sum() * (y[m].mean() - obar) ** 2
    rel, res = rel / len(y), res / len(y)
    unc = obar * (1 - obar)
    assert abs(r.reliability - rel) < 1e-5
    assert abs(r.resolution - res) < 1e-5
    assert abs(r.uncertainty - unc) < 1e-5
    # Murphy identity holds exactly for bin-mean predictions
    assert abs(r.brier_binned - (rel - res + unc)) < 1e-5
    # and the raw Brier differs from the binned one only by the
    # (nonnegative) within-bin variance of p
    wbv = sum(
        (b == k).sum() * p[b == k].var() for k in set(b)
    ) / len(y)
    assert abs((r.brier_raw - r.brier_binned) - wbv) < 1e-4


def test_theils_u_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext155 import q_theils_u
    from arrow_supercluster_spark.sources.tables import read_events
    from pyspark.sql import functions as F

    r = q_theils_u(spark, sf_dir).collect()[0]
    daily = (
        read_events(spark, sf_dir)
        .groupBy(F.dayofmonth("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    daily.sort(key=lambda x: x.d)
    x = np.array([row.d for row in daily], float)
    y = np.array([row.c for row in daily], float)
    n = len(x)
    sl = ((x * y).sum() - x.sum() * y.sum() / n) / (
        (x * x).sum() - x.sum() ** 2 / n
    )
    b0 = y.mean() - sl * x.mean()
    # steps restricted to adjacent calendar days, as in the query
    days = {int(row.d): row.c for row in daily}
    se_m = se_n = 0.0
    k = 0
    for d in sorted(days):
        if d - 1 not in days:
            continue
        yp, yt = days[d - 1], days[d]
        f = b0 + sl * d
        se_m += ((f - yt) / yp) ** 2
        se_n += ((yt - yp) / yp) ** 2
        k += 1
    u2 = np.sqrt(se_m / se_n)
    assert r.n_steps == k
    assert abs(r.theils_u2 - u2) < 1e-5
    assert r.beats_naive == (u2 < 1)
