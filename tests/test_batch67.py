"""Batch-67 tests: banding S-curve monotonicity and containment."""

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_bands_sweep_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["q_lsh_bands_sweep"].spark(spark, sf_dir).collect(),
        key=lambda r: r.n_bands,
    )
    assert [(r.n_bands, r.rows_per_band) for r in rows] == [(2, 8), (4, 4), (8, 2)]
    # more bands with fewer rows can only ADD candidates: a full 8-wide
    # band match implies both constituent 4-wide bands match, etc.
    counts = [r.n_candidate_pairs for r in rows]
    assert counts[0] <= counts[1] <= counts[2]
    assert counts[2] > 0  # 2-row bands fire on the template corpus
