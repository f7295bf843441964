"""Batch-166 tests: sklearn parity for the confusion/MCC point, exact
replay for log loss and the threshold table."""

import math


def _scored(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext55 import _spark_scored

    return [
        (r.score, r.label) for r in _spark_scored(spark, sf_dir).collect()
    ]


def test_confusion_mcc_textbook_parity(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext171 import (
        _CM_THRESH,
        q_confusion_mcc,
    )

    r = q_confusion_mcc(spark, sf_dir).collect()[0]
    data = _scored(spark, sf_dir)
    y = [lab for _, lab in data]
    pred = [1 if s > _CM_THRESH else 0 for s, _ in data]
    tp = sum(1 for p, t in zip(pred, y) if p == 1 and t == 1)
    fp = sum(1 for p, t in zip(pred, y) if p == 1 and t == 0)
    tn = sum(1 for p, t in zip(pred, y) if p == 0 and t == 0)
    fn = sum(1 for p, t in zip(pred, y) if p == 0 and t == 1)
    assert (r.tp, r.fp, r.tn, r.fn) == (tp, fp, tn, fn)
    assert abs(r.accuracy - round((tp + tn) / len(y), 6)) < 1e-9
    assert (
        abs(
            r.balanced_accuracy
            - round(0.5 * (tp / (tp + fn) + tn / (tn + fp)), 6)
        )
        < 1e-9
    )
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(r.mcc - mcc) < 1e-5
    # sklearn cross-check when available
    try:
        from sklearn.metrics import matthews_corrcoef
    except ImportError:
        pass
    else:
        assert abs(r.mcc - matthews_corrcoef(y, pred)) < 1e-5
    # a real operating point: positives and negatives both predicted
    assert r.tp > 0 and r.tn > 0


def test_log_loss_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext171 import (
        _LL_SCALE,
        _LL_THETA,
        q_log_loss,
    )

    r = q_log_loss(spark, sf_dir).collect()[0]
    data = _scored(spark, sf_dir)
    terms = []
    pos = []
    for s, lab in data:
        p = 1.0 / (1.0 + math.exp(-(s - _LL_THETA) / _LL_SCALE))
        terms.append(lab * math.log(p) + (1 - lab) * math.log(1 - p))
        if lab == 1:
            pos.append(math.log(p))
    assert r.n == len(data)
    assert abs(r.log_loss - (-sum(terms) / len(terms))) < 1e-5
    assert abs(r.avg_pos_logp - sum(pos) / len(pos)) < 1e-5
    assert r.log_loss > 0


def test_threshold_metrics_replay_and_monotone_recall(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext171 import (
        _TM_THRESHOLDS,
        q_threshold_metrics,
    )

    rows = {r.thresh: r for r in q_threshold_metrics(spark, sf_dir).collect()}
    assert set(rows) == set(_TM_THRESHOLDS)
    data = _scored(spark, sf_dir)
    last_recall = None
    for t in sorted(_TM_THRESHOLDS):
        r = rows[t]
        tp = sum(1 for s, lab in data if s > t and lab == 1)
        fp = sum(1 for s, lab in data if s > t and lab == 0)
        tn = sum(1 for s, lab in data if s <= t and lab == 0)
        fn = sum(1 for s, lab in data if s <= t and lab == 1)
        assert (r.tp, r.fp, r.tn, r.fn) == (tp, fp, tn, fn)
        if tp + fp > 0:
            assert abs(r.precision - round(tp / (tp + fp), 6)) < 1e-9
        else:
            assert r.precision is None
        assert abs(r.recall - round(tp / (tp + fn), 6)) < 1e-9
        if 2 * tp + fp + fn > 0:
            assert abs(r.f1 - round(2 * tp / (2 * tp + fp + fn), 6)) < 1e-9
        else:
            assert r.f1 is None
        assert (
            abs(r.youden_j - round(tp / (tp + fn) + tn / (tn + fp) - 1, 6))
            < 1e-9
        )
        # recall must fall (weakly) as the threshold rises
        if last_recall is not None:
            assert r.recall <= last_recall + 1e-12
        last_recall = r.recall
