"""Batch-50 tests: AUC vs direct pair counting, calibration/lift
conservation and consistency."""

from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def _scored(spark, sf_dir):
    per_user = defaultdict(lambda: [0.0, 0])
    for r in read_events(spark, sf_dir).filter(F.col("value").isNotNull()).collect():
        per_user[r.user_id][0] += r.value
        if r.event_type == "purchase" and r.value > 90:
            per_user[r.user_id][1] = 1
    return [(round(v, 4), lab) for v, lab in per_user.values()]


def test_auc_vs_pair_counting(spark, sf_dir):
    data = _scored(spark, sf_dir)
    pos = [s for s, l in data if l == 1]
    neg = [s for s, l in data if l == 0]
    wins = ties = 0
    for p in pos:
        for n in neg:
            if p > n:
                wins += 1
            elif p == n:
                ties += 1
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    row = REGISTRY["q_auc"].spark(spark, sf_dir).collect()[0]
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    assert abs(row.auc - auc) < 1.01e-6
    assert 0.0 <= row.auc <= 1.0


def test_calibration_conservation(spark, sf_dir):
    rows = REGISTRY["q_calibration"].spark(spark, sf_dir).collect()
    data = _scored(spark, sf_dir)
    assert sum(r.n for r in rows) == len(data)
    assert sum(r.n_pos for r in rows) == sum(l for _, l in data)
    base = sum(l for _, l in data) / len(data)
    for r in rows:
        assert abs(r.base_rate - round(base, 6)) < 1e-9
        assert 0.0 <= r.rate <= 1.0


def test_lift_chart_properties(spark, sf_dir):
    rows = sorted(REGISTRY["q_lift_chart"].spark(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert rows[0].decile == 1 and rows[-1].decile == 10
    # gains are monotone to 1.0
    gains = [r.gain for r in rows]
    assert all(b >= a for a, b in zip(gains, gains[1:]))
    assert abs(gains[-1] - 1.0) < 1e-9
    # top decile lift >= bottom decile lift (score ranks positives high)
    assert rows[0].lift >= rows[-1].lift
    assert rows[-1].cum_pos == sum(r.n_pos for r in rows)
