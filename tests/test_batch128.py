"""Batch-128 tests: t-closeness, forecast backtest — python oracles +
triad/no-leakage properties."""

import math
from collections import Counter, defaultdict


def test_t_closeness_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext133 import (
        _TC_BINS,
        q_t_closeness,
    )

    got = q_t_closeness(spark, sf_dir).collect()
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    nations = {
        n.n_nationkey: n.n_name
        for n in spark.read.parquet(f"{sf_dir}/nation.parquet").collect()
    }
    ranked = sorted(cust, key=lambda c: (c.c_acctbal, c.c_custkey))
    n = len(ranked)
    # NTILE boundaries: first n%k buckets get ceil(n/k)
    bins = {}
    q, r = divmod(n, _TC_BINS)
    idx = 0
    for b in range(1, _TC_BINS + 1):
        size = q + (1 if b <= r else 0)
        for _ in range(size):
            bins[ranked[idx].c_custkey] = b
            idx += 1
    class_bins = defaultdict(Counter)
    glob = Counter()
    for c in cust:
        key = (c.c_mktsegment, nations[c.c_nationkey])
        b = bins[c.c_custkey]
        class_bins[key][b] += 1
        glob[b] += 1
    scored = []
    for key, cb in class_bins.items():
        nc = sum(cb.values())
        cum_c = cum_g = 0
        gap = 0
        for b in range(1, _TC_BINS):
            cum_c += cb.get(b, 0)
            cum_g += glob[b]
            gap += abs(cum_c * n - cum_g * nc)
        scored.append(
            (key[0], key[1], nc, round(gap / (nc * n * (_TC_BINS - 1)), 6))
        )
    t_val = round(max(s[3] for s in scored), 6)
    scored.sort(key=lambda s: (-s[3], s[0], s[1]))
    want = scored[:10]
    assert len(got) == len(want)
    for r_, (seg, nat, nc, emd) in zip(got, want):
        assert (r_.seg, r_.nation, r_.class_size) == (seg, nat, nc)
        assert abs(r_.emd - emd) < 1e-9
        assert abs(r_.t_value - t_val) < 1e-9
    # EMD is a normalized distance: within [0, 1]
    assert all(0 <= r_.emd <= 1 for r_ in got)


def test_forecast_backtest_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext133 import (
        _FB_ALPHA,
        _FB_SCALE,
        q_forecast_backtest,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.method: r for r in q_forecast_backtest(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    series = [0] * 31
    for e in ev:
        series[e.ts.day] += 1  # 1-indexed
    cs = series[1:]

    def ewma_pred(d):
        # state after folding days 1..d-1 (seeded at day 1)
        acc = float(cs[0])
        for x in cs[1 : d - 1]:
            acc = round(((1 - _FB_ALPHA) * acc + _FB_ALPHA * x) * _FB_SCALE) / _FB_SCALE
        return acc

    preds = defaultdict(list)
    for d in range(8, 31):
        c = cs[d - 1]
        if c == 0:
            continue
        preds["naive"].append((c, float(cs[d - 2])))
        preds["seasonal_naive"].append((c, float(cs[d - 8])))
        e = ewma_pred(d)
        preds["ewma"].append(
            (c, round(e * _FB_SCALE) / _FB_SCALE)
        )
    aes = {}
    for m, rows in preds.items():
        ae = sum(round(abs(c - p) * _FB_SCALE) for c, p in rows)
        ape = sum(round(abs(c - p) / c * _FB_SCALE) for c, p in rows)
        n = len(rows)
        aes[m] = ae
        r = got[m]
        assert r.n == n
        assert abs(r.mae - round(ae / (_FB_SCALE * n), 4)) < 1e-9
        assert abs(r.mape - round(ape / (_FB_SCALE * n), 6)) < 1e-9
    best = min(aes, key=lambda m: aes[m])
    assert got[best].best
    assert sum(1 for r in got.values() if r.best) == 1
