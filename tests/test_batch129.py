"""Batch-129 tests: bitemporal as-of, Mann-Kendall, circular stats —
python oracles + family properties."""

import datetime
import math
from collections import Counter, defaultdict


def test_bitemporal_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext134 import (
        _BT_KNOWN_AT,
        _BT_VALID_AT,
        q_bitemporal_asof,
    )

    [r] = q_bitemporal_asof(spark, sf_dir).collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    v = datetime.datetime.fromisoformat(_BT_VALID_AT)
    s = datetime.datetime.fromisoformat(_BT_KNOWN_AT)
    far = datetime.datetime(2998, 1, 1)
    n_then = c_then = n_now = c_now = 0
    for o in orders:
        od = o.o_orderdate
        valid_from = od
        valid_to = od + datetime.timedelta(days=180)
        sys_from = od + datetime.timedelta(days=o.o_orderkey % 30)
        sys_to = (
            od + datetime.timedelta(days=(o.o_orderkey % 30) + 90)
            if o.o_orderkey % 4 == 0
            else datetime.datetime(2999, 1, 1)
        )
        cents = round(round(o.o_totalprice, 2) * 100)
        if valid_from <= v < valid_to:
            if sys_from <= s < sys_to:
                n_then += 1
                c_then += cents
            if sys_to > far:
                n_now += 1
                c_now += cents
    assert (r.n_known_then, r.n_known_now) == (n_then, n_now)
    assert abs(r.value_known_then - round(c_then / 100.0, 2)) < 1e-9
    assert abs(r.value_known_now - round(c_now / 100.0, 2)) < 1e-9
    assert r.restatement_rows == n_now - n_then
    # the construction guarantees restatements exist: late arrivals not
    # yet known at S, retractions removed from the current view
    assert r.n_known_then != r.n_known_now


def test_mann_kendall_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext134 import (
        q_mann_kendall,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_mann_kendall(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day for e in ev)
    days = sorted(daily)
    cs = [daily[d] for d in days]
    n = len(cs)
    s_stat = sum(
        (1 if cs[j] > cs[i] else -1 if cs[j] < cs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(cs)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    zn = s_stat - 1 if s_stat > 0 else (s_stat + 1 if s_stat < 0 else 0)
    z = zn / math.sqrt(var_s)
    assert r.s_stat == s_stat
    assert r.n == n
    assert abs(r.var_s - round(var_s, 4)) < 1e-9
    assert abs(r.z - round(z, 4)) < 1e-9
    assert r.increasing == (s_stat > 0)


def test_circular_stats_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext134 import (
        _CS_SCALE,
        q_circular_stats,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.event_type: r for r in q_circular_stats(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    groups = defaultdict(list)
    for e in ev:
        groups[e.event_type].append(e.ts.hour)
    for t, hours in groups.items():
        cs = sum(
            round(math.cos(2 * math.pi * h / 24.0) * _CS_SCALE)
            for h in hours
        )
        ss = sum(
            round(math.sin(2 * math.pi * h / 24.0) * _CS_SCALE)
            for h in hours
        )
        n = len(hours)
        rl = math.sqrt(cs * cs + ss * ss) / (_CS_SCALE * n)
        mean_hour = (
            math.atan2(ss, cs) * 24.0 / (2 * math.pi) + 24.0
        ) % 24.0
        r = got[t]
        assert r.n == n
        assert abs(r.mean_hour - round(mean_hour, 4)) < 1e-9
        assert abs(r.resultant_r - round(rl, 6)) < 1e-9
        assert abs(r.circ_variance - round(1 - rl, 6)) < 1e-9
        assert abs(r.rayleigh_z - round(n * rl * rl, 4)) < 1e-9
        # events spread across the day: near-uniform, R close to 0
        assert 0 <= r.resultant_r < 0.5


def test_circular_mean_wraps_correctly(spark):
    """The defining circular property: hours 23 and 1 average to
    midnight (0), never noon."""
    import pandas as pd

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"h": [23, 1]})
    )
    theta = 2 * math.pi * F.col("h") / 24.0
    [row] = df.agg(
        F.sum(F.sin(theta)).alias("ss"), F.sum(F.cos(theta)).alias("cs")
    ).collect()
    mean_hour = (math.atan2(row.ss, row.cs) * 24 / (2 * math.pi) + 24) % 24
    assert min(mean_hour, 24 - mean_hour) < 1e-9  # midnight, not noon
