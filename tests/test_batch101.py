"""Batch-101 tests: salted join, Welch t-test, DFT power, Holt
smoothing, Poisson dispersion, dataset checksum — independent
naive-Python/numpy oracles."""

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from arrow_supercluster_spark.sources.tables import read_events


def _daily_counts(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    rows = (
        ev.groupBy(F.date_trunc("day", "ts").alias("d"))
        .count()
        .orderBy("d")
        .collect()
    )
    return [(r.d, float(r["count"])) for r in rows]


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must be result-invariant: the salted plan's output equals
    the plain broadcast join's, row for row."""
    from arrow_supercluster_spark.plans.registry_ext106 import q_salted_join

    got = {r.event_type: (r.n, r.weighted_sum)
           for r in q_salted_join(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir)
    dim = (
        ev.select("event_type").distinct()
        .withColumn("weight", F.length("event_type"))
    )
    want = {
        r.event_type: (r.n, r.ws)
        for r in ev.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value") * F.col("weight")), 4).alias("ws"),
        )
        .collect()
    }
    assert got == want and len(got) == 5


def test_welch_ttest_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext106 import q_welch_ttest

    r = q_welch_ttest(spark, sf_dir).collect()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    en = [float(d.n_chars) for d in docs if d.lang == "en"]
    rest = [float(d.n_chars) for d in docs if d.lang != "en"]

    def mv(xs):
        m = sum(xs) / len(xs)
        return m, sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    m1, v1 = mv(en)
    m2, v2 = mv(rest)
    se2 = v1 / len(en) + v2 / len(rest)
    t = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / (
        (v1 / len(en)) ** 2 / (len(en) - 1)
        + (v2 / len(rest)) ** 2 / (len(rest) - 1)
    )
    assert r.n_en == len(en) and r.n_rest == len(rest)
    assert abs(r.t_stat - t) < 1e-4
    assert abs(r.df - df) < max(1e-3, abs(df) * 1e-6)
    # df must land between min(n1,n2)-1 and n1+n2-2 (Welch bound)
    assert min(len(en), len(rest)) - 1 <= r.df <= len(en) + len(rest) - 2


def test_dft_power_numpy_oracle(spark, sf_dir):
    import numpy as np

    from arrow_supercluster_spark.plans.registry_ext106 import q_dft_power

    got = {r.k: r.power for r in q_dft_power(spark, sf_dir).collect()}
    daily = _daily_counts(spark, sf_dir)
    d0 = daily[0][0]
    n = (daily[-1][0] - d0).days + 1
    y = np.zeros(n)
    for d, c in daily:
        y[(d - d0).days] = c
    for k in got:
        ang = 2 * math.pi * k * np.arange(n) / n
        want = float((y * np.cos(ang)).sum() ** 2 + (y * np.sin(ang)).sum() ** 2)
        assert abs(got[k] - want) < max(1e-2, abs(want) * 1e-9), (k, got[k], want)


def test_holt_linear_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext106 import (
        _HOLT_ALPHA,
        _HOLT_BETA,
        q_holt_linear,
    )

    r = q_holt_linear(spark, sf_dir).collect()[0]
    ys = [c for _, c in _daily_counts(spark, sf_dir)]
    a, b = _HOLT_ALPHA, _HOLT_BETA
    l, t = ys[1] * a + (1 - a) * (ys[0] + (ys[1] - ys[0])), None
    t = b * (ys[1] * a + (1 - a) * (ys[0] + (ys[1] - ys[0])) - ys[0]) + (
        1 - b
    ) * (ys[1] - ys[0])
    for y in ys[2:]:
        l_new = y * a + (1 - a) * (l + t)
        t = b * (l_new - l) + (1 - b) * t
        l = l_new
    assert r.n_days == len(ys)
    assert abs(r.level - l) < 1e-4
    assert abs(r.trend - t) < 1e-4
    assert abs(r.forecast_7 - (l + 7 * t)) < 1e-4


def test_poisson_dispersion_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext106 import (
        q_poisson_dispersion,
    )

    r = q_poisson_dispersion(spark, sf_dir).collect()[0]
    ys = [c for _, c in _daily_counts(spark, sf_dir)]
    m = sum(ys) / len(ys)
    v = sum((y - m) ** 2 for y in ys) / (len(ys) - 1)
    assert r.n_days == len(ys)
    assert abs(r.mean_count - m) < 1e-4
    assert abs(r.var_count - v) < 1e-3
    assert abs(r.dispersion - v / m) < 1e-4
    assert abs(r.chi2_stat - (len(ys) - 1) * v / m) < 1e-2


def test_dataset_checksum_python_oracle_and_sensitivity(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext106 import (
        q_dataset_checksum,
    )

    got = {r.source: (r.n_docs, r.checksum)
           for r in q_dataset_checksum(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    want_n, want_sum = Counter(), Counter()
    for d in docs:
        norm = " ".join(d.text.strip().lower().split())
        h = hashlib.md5(f"{d.doc_id}:{norm}".encode()).hexdigest()
        want_n[d.source] += 1
        want_sum[d.source] += sum(
            (i + 1) * ord(c) for i, c in enumerate(h)
        )
    assert got == {s: (want_n[s], want_sum[s]) for s in want_n}
    # sensitivity: changing one char of one doc moves that shard's sum
    d0 = docs[0]
    h2 = hashlib.md5(f"{d0.doc_id}:x{d0.text.lower()}".encode()).hexdigest()
    v2 = sum((i + 1) * ord(c) for i, c in enumerate(h2))
    h1 = hashlib.md5(
        f"{d0.doc_id}:{' '.join(d0.text.strip().lower().split())}".encode()
    ).hexdigest()
    v1 = sum((i + 1) * ord(c) for i, c in enumerate(h1))
    assert v1 != v2
