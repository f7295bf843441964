"""Batch-143 tests: Good-Turing, Durbin-Watson, Atkinson — python
oracles + smoothing/welfare properties."""

import math
import re
from collections import Counter


def test_good_turing_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext148 import (
        _GT_MAX_R,
        q_good_turing,
    )

    got = {r.r: r for r in q_good_turing(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    vocab = Counter()
    for d in docs:
        t = re.sub(r"\s+", " ", d.text.strip().lower())
        vocab.update(x for x in t.split(" ") if x)
    fof = Counter(vocab.values())
    n = sum(vocab.values())
    p0 = fof.get(1, 0) / n
    expect_rs = sorted(fof)[:_GT_MAX_R]
    assert set(got) == set(expect_rs)
    for r_v in expect_rs:
        nr = fof[r_v]
        row = got[r_v]
        assert row.nr == nr
        nxt = fof.get(r_v + 1)
        assert row.nr_next == (nxt or 0)
        if nxt:
            assert abs(
                row.r_star - round((r_v + 1) * nxt / nr, 6)
            ) < 1e-9
            # GT discounts observed counts: r* < r for heavy-tail fof
        else:
            assert row.r_star is None
        assert abs(row.p_unseen - round(p0, 6)) < 1e-9
    assert 0 <= next(iter(got.values())).p_unseen < 1


def test_durbin_watson_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext148 import (
        q_durbin_watson,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_durbin_watson(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day for e in ev)
    pts = sorted(daily.items())
    n = len(pts)
    sx = sum(d for d, _ in pts)
    sy = sum(c for _, c in pts)
    sxy = sum(d * c for d, c in pts)
    sxx = sum(d * d for d, _ in pts)
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    b0 = sy / n - slope * sx / n
    e = {d: c - (b0 + slope * d) for d, c in pts}
    num = sum(
        (e[d + 1] - e[d]) ** 2 for d in e if d + 1 in e
    )
    den = sum(v * v for v in e.values())
    assert r.n_days == n
    assert abs(r.durbin_watson - round(num / den, 4)) < 1e-9
    assert abs(r.trend_slope - round(slope, 6)) < 1e-9
    assert 0 <= r.durbin_watson <= 4


def test_atkinson_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext148 import (
        _ATK_EPS,
        _TH_SCALE,
        q_atkinson_index,
    )

    [r] = q_atkinson_index(spark, sf_dir).collect()
    ys = [
        d.n_chars
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        if d.n_chars > 0
    ]
    n = len(ys)
    sy = sum(ys)
    terms = sum(
        round((y * n / sy) ** (1 - _ATK_EPS) * _TH_SCALE) for y in ys
    )
    atk = 1 - (terms / (_TH_SCALE * n)) ** (1 / (1 - _ATK_EPS))
    assert r.n_docs == n
    assert abs(r.mean_y - round(sy / n, 4)) < 1e-9
    assert abs(r.atkinson - round(atk, 6)) < 1e-9
    # Atkinson lives in [0, 1); zero only under perfect equality
    assert 0 <= r.atkinson < 1
