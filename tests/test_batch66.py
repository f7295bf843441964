"""Batch-66 tests: hazard ≡ KM consistency, effective counts bounds."""

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_hazard_consistent_with_km(spark, sf_dir):
    hz = {r.t_days: r for r in REGISTRY["q_hazard_rate"].spark(spark, sf_dir).collect()}
    km = {r.t_days: r for r in REGISTRY["q_kaplan_meier"].spark(spark, sf_dir).collect()}
    if not hz:
        # no churn events at this SF -> survival must be flat 1.0
        assert all(abs(r.survival - 1.0) < 1e-9 for r in km.values())
        return
    for t, r in hz.items():
        assert 0.0 < r.hazard <= 1.0
        assert km[t].d == r.d and km[t].at_risk == r.at_risk
    # survival product identity: S(t) == prod(1 - h) over hazard days <= t
    ts = sorted(km)
    prod = 1.0
    for t in ts:
        if t in hz and hz[t].d < hz[t].at_risk:
            prod *= 1.0 - hz[t].d / hz[t].at_risk
        assert abs(km[t].survival - round(prod, 6)) < 5e-5, t


def test_effective_counts_bounds(spark, sf_dir):
    rows = {r.dimension: r for r in REGISTRY["q_effective_counts"].spark(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for dim in ("source", "lang"):
        listed = docs.select(dim).distinct().count()
        r = rows[dim]
        assert r.n_listed == listed
        assert 1.0 <= r.n_effective <= listed + 1e-6
