"""Batch 230 replays — causal-inference / empirical-Bayes estimators
(R669–R674): algebraic identities recomputed from the emitted cells,
plus design invariants.  Everything deterministic."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def _users(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    return read_events(spark, sf_dir).select("user_id").distinct()


def test_did_identity_and_universe(spark, sf_dir):
    row = REGISTRY["q_did_estimator"].spark(spark, sf_dir).collect()[0]
    n_users = _users(spark, sf_dir).count()
    assert row.n_treated + row.n_control == n_users
    did = (row.treated_post - row.treated_pre) - (
        row.control_post - row.control_pre
    )
    assert abs(did - row.did) < 5e-4  # rounding at the printed grain
    # the naive estimator differs from DiD by exactly the pre-imbalance
    assert abs(
        (row.naive_post_diff - row.did)
        - (row.treated_pre - row.control_pre)
    ) < 5e-4


def test_iv_wald_relevance_and_ratio(spark, sf_dir):
    row = REGISTRY["q_iv_wald"].spark(spark, sf_dir).collect()[0]
    assert row.n_encouraged > 0 and row.n_rest > 0
    assert row.first_stage > 0, "instrument must be relevant on this data"
    assert abs(row.wald_late - row.reduced_form / row.first_stage) < 5e-3


def test_propensity_strata_bounds(spark, sf_dir):
    row = REGISTRY["q_propensity_strata"].spark(spark, sf_dir).collect()[0]
    assert 1 <= row.n_strata_used <= 5
    n_users = _users(spark, sf_dir).count()
    assert row.n_users_covered <= n_users
    assert row.ate_stratified is not None


def test_james_stein_shrinks_toward_grand_mean(spark, sf_dir):
    rows = REGISTRY["q_james_stein"].spark(spark, sf_dir).collect()
    assert len(rows) >= 4  # k >= 4 nations at every SF
    shrink = rows[0].shrink_factor
    assert 0.0 <= shrink <= 1.0
    raw = [r.raw_mean for r in rows]
    grand = sum(raw) / len(raw)
    for r in rows:
        # shrunk mean lies between the raw mean and the grand mean
        lo, hi = sorted((r.raw_mean, grand))
        assert lo - 1e-3 <= r.js_mean <= hi + 1e-3, (r, grand)


def test_beta_binomial_eb_shrinks_toward_prior(spark, sf_dir):
    rows = REGISTRY["q_beta_binomial_eb"].spark(spark, sf_dir).collect()
    assert rows
    a, b = rows[0].alpha, rows[0].beta
    assert a > 0 and b > 0
    prior = a / (a + b)
    for r in rows:
        assert 0.0 <= r.eb_rate <= 1.0
        lo, hi = sorted((r.raw_rate, prior))
        assert lo - 1e-6 <= r.eb_rate <= hi + 1e-6, (r, prior)


def test_win_ratio_pair_conservation(spark, sf_dir):
    row = REGISTRY["q_win_ratio"].spark(spark, sf_dir).collect()[0]
    did = REGISTRY["q_did_estimator"].spark(spark, sf_dir).collect()[0]
    assert (
        row.wins + row.losses + row.ties == did.n_treated * did.n_control
    )
    assert row.win_ratio > 0
