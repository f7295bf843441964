"""Batch-29 tests: Zipf fit shape, percent-rank properties, bootstrap CI
coverage of the point estimate."""

from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_zipf_fit_shape(spark, sf_dir):
    row = REGISTRY["q_zipf_fit"].spark(spark, sf_dir).collect()[0]
    # n = min(100, |vocab|): the sf0.001 corpus has a ~31-token vocabulary
    assert 20 <= row.n <= 100
    assert row.slope < 0  # frequency falls with rank
    # the synthetic corpus is templated (small vocab, near-uniform
    # frequencies), so the log-log fit is weak — only the SIGN of the
    # correlation is a corpus-independent invariant; natural corpora
    # approach r = -1 (that discrimination is exactly what the operator
    # measures)
    assert row.r < 0


def test_percent_rank_properties(spark, sf_dir):
    rows = REGISTRY["q_percent_rank"].spark(spark, sf_dir).collect()
    by_arm = defaultdict(list)
    for r in rows:
        assert 0.0 <= r.pr <= 1.0 and 0.0 < r.cd <= 1.0
        by_arm[r.arm].append(r)
    for arm, rs in by_arm.items():
        rs.sort(key=lambda r: (r.spend, r.user_id))
        assert rs[0].pr == 0.0
        assert abs(rs[-1].pr - 1.0) < 1e-9
        assert abs(rs[-1].cd - 1.0) < 1e-9
        for a, b in zip(rs, rs[1:]):
            assert a.pr <= b.pr and a.cd <= b.cd


def test_bootstrap_ci_covers_point_estimate(spark, sf_dir):
    row = REGISTRY["q_bootstrap_ci"].spark(spark, sf_dir).collect()[0]
    assert row.n_reps == 100
    assert row.lo <= row.mid <= row.hi
    mean = (
        read_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .agg(F.avg("value"))
        .collect()[0][0]
    )
    assert row.lo <= mean <= row.hi
    # interval is informative, not degenerate or absurdly wide
    assert 0 < row.hi - row.lo < mean
