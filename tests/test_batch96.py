"""Batch-96 tests: Theil-Sen robustness, BH discovery boundary,
conformal coverage guarantee."""

import math
import tempfile

from pyspark.sql import functions as F


def _write_events(spark, d, rows):
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double, t string"
    ).select(
        "event_id", F.to_timestamp("t").alias("ts"), "user_id",
        "event_type", "value", F.lit('{"k": 1}').alias("props"),
    ).write.parquet(f"{d}/events.parquet")


def test_theil_sen_robust_to_outlier_day(spark):
    """Perfect slope-2 trend with one massive outlier day: OLS would be
    dragged, Theil-Sen's median slope stays 2."""
    from arrow_supercluster_spark.plans.registry_ext101 import q_theil_sen

    rows = []
    eid = 0
    for day in range(10):
        n = 2 * day + 3 if day != 5 else 80   # outlier day
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, 1, "a", 1.0, f"2024-01-{day + 1:02d} 00:00:00")
            )
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, rows)
        [r] = q_theil_sen(spark, d).collect()
        assert r.n_pairs == 45
        assert r.ts_slope == 2.0


def test_bh_fdr_structure(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext101 import q_bh_fdr

    rows = sorted(q_bh_fdr(spark, sf_dir).collect(), key=lambda r: r.rank)
    m = len(rows)
    # ranks contiguous, p ascending, thresholds = k*alpha/m
    assert [r.rank for r in rows] == list(range(1, m + 1))
    ps = [r.p_value for r in rows]
    assert ps == sorted(ps)
    for r in rows:
        assert abs(r.bh_threshold - round(r.rank * 0.1 / m, 8)) < 1e-12
    # discoveries form a prefix of the ranking (step-up property)
    disc = [r.discovered for r in rows]
    assert disc == sorted(disc, reverse=True)
    # erf sanity through the full pipeline: p-values in [0, 1]
    assert all(0.0 <= p <= 1.0 for p in ps)


def test_erf_polynomial_accuracy():
    from arrow_supercluster_spark.plans.registry_ext101 import _erf_col

    # evaluate the same polynomial in pure python and compare to math.erf
    def erf_poly(x):
        t = 1 / (1 + 0.3275911 * x)
        poly = (
            (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592
        ) * t
        return 1 - poly * math.exp(-x * x)

    for x in [0.0, 0.1, 0.5, 1.0, 1.96, 2.5, 4.0]:
        assert abs(erf_poly(x) - math.erf(x)) < 1.5e-7, x
    assert _erf_col is not None  # symbol exercised via the query


def test_conformal_coverage_at_least_target(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext101 import q_conformal

    rows = q_conformal(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # finite-sample marginal guarantee is >= 1 - alpha in
        # EXPECTATION over calibration draws; empirically allow slack
        assert r.coverage >= 0.8, r
        assert r.q_hat > 0
        assert r.n_cal > 0 and r.n_test > 0
