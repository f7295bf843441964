"""Batch-116 tests: diff-in-diff, Hurst R/S, media payload dedup —
python oracles + construction ground truths."""

import math
from collections import defaultdict


def test_diff_in_diff_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext121 import (
        _DID_SPLIT_DAY,
        _events,
        q_diff_in_diff,
    )

    got = {
        (r.variant, r.period): r
        for r in q_diff_in_diff(spark, sf_dir).collect()
    }
    ev = [
        e
        for e in _events(spark, sf_dir).collect()
        if e.event_type == "purchase"
    ]
    cells = defaultdict(lambda: [0, 0])
    for e in ev:
        variant = "treat" if e.user_id % 2 == 1 else "control"
        period = "post" if e.ts.day >= _DID_SPLIT_DAY else "pre"
        c = cells[(variant, period)]
        c[0] += 1
        c[1] += round(e.value * 100)
    means = {k: v[1] / (100.0 * v[0]) for k, v in cells.items()}
    did = (
        means[("treat", "post")] - means[("treat", "pre")]
    ) - (means[("control", "post")] - means[("control", "pre")])
    assert set(got) == set(cells)
    for k, (n, _) in cells.items():
        r = got[k]
        assert r.n == n
        assert abs(r.mean_value - round(means[k], 4)) < 1e-9
        assert abs(r.did_estimate - round(did, 4)) < 1e-9


def test_hurst_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext121 import (
        _HURST_SIZES,
        _events,
        q_hurst_rs,
    )

    got = {r.block_hours: r for r in q_hurst_rs(spark, sf_dir).collect()}
    ev = _events(spark, sf_dir).collect()
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    counts = defaultdict(int)
    for e in ev:
        counts[int((e.ts.replace(minute=0, second=0, microsecond=0) - t0)
                   .total_seconds() // 3600)] += 1
    mx = max(counts)
    series = [counts.get(h, 0) for h in range(mx + 1)]
    sizes = {}
    for n in _HURST_SIZES:
        rss = []
        for b0 in range(0, len(series) - n + 1, n):
            blk = series[b0 : b0 + n]
            if len(blk) < n:
                continue
            s, ssq = sum(blk), sum(c * c for c in blk)
            var = (ssq - s * s * 1.0 / n) / n
            if var <= 0:
                continue
            mean = s * 1.0 / n
            cum, lo, hi = 0.0, math.inf, -math.inf
            for i, c in enumerate(blk):
                cum = (cum + c) if i else float(c)
                dev = cum - (i + 1) * mean
                lo, hi = min(lo, dev), max(hi, dev)
            rss.append((hi - lo) / math.sqrt(var))
        if rss:
            sizes[n] = (
                round(sum(round(r * 1e6) for r in rss) / len(rss) / 1e6, 6),
                len(rss),
            )
    assert set(got) == set(sizes)
    pts = [(math.log(n), math.log(v[0])) for n, v in sizes.items()]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    hurst = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    for n, (mean_rs, n_blocks) in sizes.items():
        r = got[n]
        assert abs(r.mean_rs - mean_rs) < 1e-9
        assert r.n_blocks == n_blocks
        assert abs(r.hurst - round(hurst, 4)) < 1e-9
    # a sane Hurst exponent for a counting series
    assert 0.0 < got[_HURST_SIZES[0]].hurst < 1.2


def test_media_dedup_ground_truth(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext121 import (
        _MEDIA_DEDUP_MOD,
        q_media_dedup,
    )

    [r] = q_media_dedup(spark, sf_dir).collect()
    doc_ids = [
        d.doc_id
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    groups = defaultdict(list)
    for d in doc_ids:
        groups[d % _MEDIA_DEDUP_MOD].append(d)
    assert r.n_files == len(doc_ids)
    assert r.n_unique == len(groups)
    assert r.n_dup_groups == sum(1 for g in groups.values() if len(g) > 1)
    assert r.max_group == max(len(g) for g in groups.values())
    assert r.keeper_id_sum == sum(min(g) for g in groups.values())
