"""Batch 232 replays — partial correlation + Rényi spectrum
(R679–R680)."""

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_partial_corr_identity_and_bounds(spark, sf_dir):
    row = REGISTRY["q_partial_corr"].spark(spark, sf_dir).collect()[0]
    for v in (row.r_xy, row.r_xz, row.r_yz, row.r_xy_given_z):
        assert -1.0 <= v <= 1.0
    # recompute the partial from the emitted raw correlations
    import math

    want = (row.r_xy - row.r_xz * row.r_yz) / math.sqrt(
        (1 - row.r_xz**2) * (1 - row.r_yz**2)
    )
    assert abs(want - row.r_xy_given_z) < 1e-4
    # conditioning on total activity must strip exposure: |partial| < |raw|
    assert abs(row.r_xy_given_z) <= abs(row.r_xy) + 1e-6


def test_renyi_spectrum_is_monotone(spark, sf_dir):
    """H_½ ≥ H_shannon ≥ H_collision for every source (Rényi entropy is
    non-increasing in α) — the identity that certifies all three
    formulas agree on the same distribution."""
    rows = REGISTRY["q_renyi_entropy"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.h_half >= r.h_shannon - 1e-6, r
        assert r.h_shannon >= r.h_collision - 1e-6, r
        assert r.h_collision > 0
