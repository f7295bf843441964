"""Batch-53 tests: IVF recall monotone in nprobe, quantization overlap
floors."""

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
