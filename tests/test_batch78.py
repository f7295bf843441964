"""Batch 78 (round 3) — training-mix construction: oracle parity plus
the semantic invariants (temperature math, cap enforcement, draw
determinism)."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from tests.oracle_harness import compare, duck_connection

NAMES = ["q_temperature_mix", "q_source_cap", "q_quality_logit"]


def test_batch78_oracle_parity(spark, sf_dir):
    con = duck_connection(sf_dir)
    for name in NAMES:
        qd = REGISTRY[name]
        errs = compare(name, qd.spark(spark, sf_dir), con, qd.sql)
        assert not errs, errs


def test_temperature_upweights_tail(spark, sf_dir):
    """α<1 must compress the mix: the dominant language's target share
    drops below its raw share, every tail language's rises, and the
    targets sum to 1."""
    rows = REGISTRY["q_temperature_mix"].spark(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    assert abs(sum(r.target_p for r in rows) - 1.0) < 1e-4
    for r in rows:
        raw = r.n_docs / total
        if raw == max(x.n_docs for x in rows) / total:
            assert r.target_p < raw
        # kept count within binomial-ish distance of the expectation
        assert r.n_kept <= r.n_docs
        assert 0.0 < r.keep_rate <= 1.0


def test_source_cap_enforced(spark, sf_dir):
    rows = REGISTRY["q_source_cap"].spark(spark, sf_dir).collect()
    assert rows and all(r.n_kept <= 15 for r in rows)


def test_quality_logit_deciles(spark, sf_dir):
    df = REGISTRY["q_quality_logit"].spark(spark, sf_dir)
    rows = df.collect()
    assert all(0.0 <= r.q_score <= 1.0 for r in rows)
    assert {r.decile for r in rows} == set(range(1, 11))
    # deciles are monotone in score
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r.decile, []).append(r.q_score)
    for d in range(1, 10):
        assert max(by_decile[d]) <= min(by_decile[d + 1]) + 1e-9
