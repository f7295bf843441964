"""Batch 228 replays — warehouse + evaluation completions (R659–R664).
Each new entry carries an algebraic invariant check here on top of its
DuckDB differential in the sweep."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_tpch_q6_matches_manual_filter(spark, sf_dir):
    row = REGISTRY["q_tpch_q6"].spark(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    manual = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).count()
    assert row.n_lines == manual
    assert row.revenue > 0


def test_gamma_bounds_and_hand_case(spark, sf_dir):
    row = REGISTRY["q_gamma_assoc"].spark(spark, sf_dir).collect()[0]
    assert row.concordant >= 0 and row.discordant >= 0
    assert -1.0 <= row.gamma <= 1.0
    # hand case: perfectly concordant 2×2 contingency → γ = 1
    import pandas as pd

    cells = pd.DataFrame(
        {"px": [1, 2], "band": [0, 1], "n": [3, 4]}
    )
    c = d = 0
    for _, a in cells.iterrows():
        for _, b in cells.iterrows():
            if a.px < b.px and a.band < b.band:
                c += a.n * b.n
            if a.px < b.px and a.band > b.band:
                d += a.n * b.n
    assert (c - d) / (c + d) == 1.0


def test_ewma_limits_and_breach_consistency(spark, sf_dir):
    rows = REGISTRY["q_ewma_control"].spark(spark, sf_dir).collect()
    assert len(rows) >= 28  # 30 calendar days of events at every SF
    for r in rows:
        assert r.lcl < r.ucl
        assert r.breach == (r.ewma > r.ucl or r.ewma < r.lcl) or (
            # rounding at the printed grain may sit exactly on the limit
            abs(r.ewma - r.ucl) < 2e-6 or abs(r.ewma - r.lcl) < 2e-6
        )
    # limits widen monotonically toward the asymptote
    ucls = [r.ucl for r in sorted(rows, key=lambda x: x.t)]
    assert all(b >= a - 1e-9 for a, b in zip(ucls, ucls[1:]))


def test_cindex_range_and_comparability(spark, sf_dir):
    row = REGISTRY["q_cindex"].spark(spark, sf_dir).collect()[0]
    assert row.comparable_pairs > 0
    assert 0.0 <= row.c_index <= 1.0


def test_granger_rss_nesting(spark, sf_dir):
    """The full model nests the restricted one: RSS_f ≤ RSS_r, so the
    F statistic is nonnegative by construction."""
    row = REGISTRY["q_granger_lite"].spark(spark, sf_dir).collect()[0]
    assert row.n_samples >= 27
    assert row.rss_full <= row.rss_restricted + 1e-6
    assert row.f_stat >= -1e-9


def test_random_projection_jl_expectation(spark, sf_dir):
    """E‖Rx‖² = d'·‖x‖² for ±1 entries, so the mean distance ratio over
    pairs concentrates near 1.  These embeddings are CORRELATED across
    dims (not isotropic), so single-pair ratios spread far wider than
    the Gaussian √(2/d') intuition (measured sd ≈ 1.24, max ≈ 10.9 at
    sf0.01) — the mean is the JL quantity, bounded here; the spread is
    reported, not bounded tightly.  All values deterministic (pinned
    sign matrix)."""
    row = REGISTRY["q_random_projection"].spark(spark, sf_dir).collect()[0]
    assert row.n_pairs >= 40
    assert 0.7 <= row.mean_ratio <= 1.3, row.mean_ratio
    assert row.min_ratio > 0
    assert row.sd_ratio < 3.0


def test_hash_cap_identity_below_and_engages_above(spark):
    """spark_hash_cap is the identity while n <= CAP and a ~CAP-sized
    deterministic slice above it (the r10 100 TB pair-stage bound for
    q_cindex/q_win_ratio)."""
    from arrow_supercluster_spark.plans import registry_ext228 as m

    small = spark.range(0, 1000).withColumnRenamed("id", "user_id")
    assert m.spark_hash_cap(small).count() == 1000  # identity under CAP

    big_n = m._PAIR_USER_CAP * 4
    big = spark.range(0, big_n).withColumnRenamed("id", "user_id")
    kept = m.spark_hash_cap(big).count()
    # expected keep = CAP; affine-hash slice is near-uniform, allow 15%
    assert abs(kept - m._PAIR_USER_CAP) < 0.15 * m._PAIR_USER_CAP
    # deterministic: same input -> same sample
    assert m.spark_hash_cap(big).count() == kept
