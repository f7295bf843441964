"""Batch-53 tests: IVF recall monotone in nprobe, quantization overlap
floors."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from arrow_supercluster_spark.plans.registry import REGISTRY


def test_ivf_recall_curve(spark, sf_dir):
    rows = sorted(REGISTRY["q_ivf_eval"].spark(spark, sf_dir).collect(), key=lambda r: r.nprobe)
    assert [r.nprobe for r in rows] == [1, 2, 4]
    recalls = [r.recall for r in rows]
    # recall is (weakly) monotone in probe budget and reaches a useful
    # level at nprobe=4 (matches the existing >=50%-recall IVF floor)
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] >= 0.5
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        assert r.n_hit <= r.n_exact


def test_quantization_overlap_floor(spark, sf_dir):
    rows = REGISTRY["q_quantization_ablation"].spark(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.k == 5
        assert 0 <= r.n_overlap <= 5
    # int8 is a mild perturbation: average top-5 overlap stays high
    avg = sum(r.overlap_at_k for r in rows) / len(rows)
    assert avg >= 0.8, avg
