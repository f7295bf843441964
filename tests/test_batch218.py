"""Batch-218 tests: python replays of the forecast-accuracy
completions (sMAPE/MASE/Theil's U, tracking signal, interval
coverage) on the daily series."""

import math

from pyspark.sql import functions as F


def _series(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    rows = (
        read_events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("day")
        .collect()
    )
    return [r.c for r in rows]


def test_forecast_accuracy_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext223 import _EVAL_FROM

    c = _series(spark, sf_dir)
    # rn is 1-based; eval rows rn >= _EVAL_FROM need rn-7 >= 1
    ev = [
        (c[rn - 1], c[rn - 2], c[rn - 8])
        for rn in range(_EVAL_FROM, len(c) + 1)
    ]
    scale = sum(
        abs(c[rn - 1] - c[rn - 2]) for rn in range(2, _EVAL_FROM)
    ) / (_EVAL_FROM - 2)
    got = {
        r.method: r
        for r in REGISTRY["q_forecast_accuracy"].spark(
            spark, sf_dir
        ).collect()
    }
    rmse_naive = math.sqrt(
        sum((y - f) ** 2 for y, f, _ in ev) / len(ev)
    )
    for method, fidx in (("naive", 1), ("seasonal_naive", 2)):
        preds = [(t[0], t[fidx]) for t in ev]
        mae = sum(abs(y - f) for y, f in preds) / len(preds)
        smape = sum(
            2 * abs(y - f) / (abs(y) + abs(f)) for y, f in preds
        ) / len(preds)
        rmse = math.sqrt(sum((y - f) ** 2 for y, f in preds) / len(preds))
        row = got[method]
        assert abs(row.mae - mae) < 1e-4, method
        assert abs(row.smape - smape) < 1e-5, method
        assert abs(row.mase - mae / scale) < 1e-4, method
        assert abs(row.theil_u - rmse / rmse_naive) < 1e-4, method
    assert got["naive"].theil_u == 1.0


def test_tracking_signal_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext223 import _EVAL_FROM

    c = _series(spark, sf_dir)
    rows = REGISTRY["q_tracking_signal"].spark(spark, sf_dir).collect()
    errs = [
        c[rn - 1] - c[rn - 2] for rn in range(_EVAL_FROM, len(c) + 1)
    ]
    assert len(rows) == len(errs)
    cume = 0.0
    for i, (r, e) in enumerate(zip(rows, errs), 1):
        cume += e
        mad = sum(abs(x) for x in errs[:i]) / i
        assert r.error == e
        assert abs(r.cum_error - cume) < 1e-6
        assert abs(r.mad - mad) < 1e-3
        if mad > 0:
            assert abs(r.tracking_signal - cume / mad) < 1e-3
            assert r.alarm == (abs(cume / mad) > 4.0)


def test_interval_coverage_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext223 import (
        _EVAL_FROM,
        _PI_HI,
        _PI_LO,
    )

    c = _series(spark, sf_dir)
    resid = {
        rn: c[rn - 1] - c[rn - 2] for rn in range(2, len(c) + 1)
    }

    def q(vals, p):
        vals = sorted(vals)
        k = math.ceil(len(vals) * p)
        return vals[k - 1]

    hits = widths = 0
    n_eval = 0
    for rn in range(_EVAL_FROM, len(c) + 1):
        prior = [e for r, e in resid.items() if r < rn]
        lo, hi = q(prior, _PI_LO), q(prior, _PI_HI)
        y, f = c[rn - 1], c[rn - 2]
        n_eval += 1
        hits += int(f + lo <= y <= f + hi)
        widths += hi - lo
    row = REGISTRY["q_interval_coverage"].spark(spark, sf_dir).collect()[0]
    assert row.n_eval_days == n_eval
    assert row.coverage == round(hits / n_eval, 6)
    assert abs(row.mean_width - widths / n_eval) < 1e-3
    assert row.nominal == round(_PI_HI - _PI_LO, 6)
    assert 0.0 <= row.coverage <= 1.0
