"""Batch 231 replays — text stats, RAKE, semivariogram, optimizer-stats
audit (R675–R678)."""

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.plans.registry_ext231 import _RAKE_STOPS


def test_yule_k_bounds(spark, sf_dir):
    rows = REGISTRY["q_yule_k"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_types <= r.n_tokens
        assert r.yule_k > 0


def test_rake_phrases_are_stopword_free_runs(spark, sf_dir):
    rows = REGISTRY["q_rake_keyphrases"].spark(spark, sf_dir).collect()
    assert len(rows) == 15
    stops = set(_RAKE_STOPS)
    for r in rows:
        words = r.phrase.split(" ")
        assert 1 <= len(words) <= 4
        assert not (set(words) & stops), r.phrase
        assert r.score > 0 and r.n_occ >= 1
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_semivariogram_flat_on_lcg_field(spark, sf_dir):
    """The LCG point field carries no spatial structure in acctbal, so
    the variogram is pure nugget: all bands populated, gammas within
    ~2x of each other (measured spread is ~25%)."""
    rows = REGISTRY["q_semivariogram"].spark(spark, sf_dir).collect()
    assert [r.band for r in rows] == [0, 1, 2]
    gs = [r.gamma for r in rows]
    assert all(g > 0 for g in gs)
    assert max(gs) / min(gs) < 2.0, gs
    assert all(r.n_pairs > 0 for r in rows)


def test_histogram_join_estimate_exact_on_uniform_fk(spark, sf_dir):
    """customer->orders is a clean 1:N key with near-uniform buckets, so
    the CBO containment formula prices it exactly (ratio 1.0) and the
    true join count equals the orders row count (FK completeness)."""
    row = REGISTRY["q_histogram_join_est"].spark(spark, sf_dir).collect()[0]
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert row.true_rows == n_orders
    assert 0.9 <= row.est_over_true <= 1.1
    assert row.buckets_joined <= 32
