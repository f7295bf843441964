"""Batch-126 tests: autocomplete index, LSH planner, ESS — python
oracles + design properties."""

import math
import re
from collections import Counter


def test_autocomplete_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext131 import (
        _AC_PREFIX_MAX,
        _AC_TOPK,
        q_autocomplete_index,
    )

    got = {}
    for r in q_autocomplete_index(spark, sf_dir).collect():
        got.setdefault(r.prefix, []).append((r.rk, r.completion, r.freq))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    vocab = Counter()
    for d in docs:
        t = re.sub(r"\s+", " ", d.text.strip().lower())
        vocab.update(x for x in t.split(" ") if x)
    want = {}
    by_prefix = {}
    for tok, f in vocab.items():
        for plen in range(1, _AC_PREFIX_MAX + 1):
            if len(tok) >= plen:
                by_prefix.setdefault(tok[:plen], []).append((tok, f))
    for pre, toks in by_prefix.items():
        toks.sort(key=lambda tf: (-tf[1], tf[0]))
        want[pre] = [
            (i + 1, t, f) for i, (t, f) in enumerate(toks[:_AC_TOPK])
        ]
    assert got == want
    # the index must answer a real lookup: any 2-char prefix present
    two = [p for p in got if len(p) == 2]
    assert two and all(got[p][0][0] == 1 for p in two)


def test_lsh_planner_python_oracle_and_shape(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext131 import (
        _LSH_GRID,
        _LSH_SCALE,
        _LSH_SIG,
        _LSH_T,
        _lsh_splits,
        q_lsh_planner,
    )

    got = {r.bands: r for r in q_lsh_planner(spark, sf_dir).collect()}
    best_tot = None
    tots = {}
    for b, r_ in _lsh_splits():
        fp = fn = 0
        for k in range(_LSH_GRID):
            s = (k + 0.5) / _LSH_GRID
            p = 1.0 - (1.0 - s**r_) ** b
            if s < _LSH_T:
                fp += round(p * _LSH_SCALE)
            else:
                fn += round((1.0 - p) * _LSH_SCALE)
        row = got[b]
        assert row.rows_per_band == r_
        assert abs(row.fp_mass - round(fp / (_LSH_SCALE * _LSH_GRID), 6)) < 1e-9
        assert abs(row.fn_mass - round(fn / (_LSH_SCALE * _LSH_GRID), 6)) < 1e-9
        tots[b] = fp + fn
    best = min(tots, key=lambda b: tots[b])
    assert got[best].recommended
    assert sum(1 for r in got.values() if r.recommended) == 1
    # extremes are bad by construction: b=1 (AND only) misses true
    # pairs, b=sig (OR only) admits everything
    assert tots[best] < tots[1]
    assert tots[best] < tots[_LSH_SIG]


def test_ess_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext131 import (
        _ESS_ALPHA,
        _ESS_SCALE,
        q_effective_sample_size,
    )

    [r] = q_effective_sample_size(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    src = Counter(d.source for d in docs)
    total = sum(src.values())
    s1 = s2 = 0
    for n in src.values():
        p = n / total
        w = p**_ESS_ALPHA / p
        s1 += round(w * _ESS_SCALE) * n
        s2 += round(w * w * _ESS_SCALE) * n
    ess = s1 * s1 / (s2 * _ESS_SCALE)
    assert r.n_rows == total
    assert abs(r.ess - round(ess, 4)) < 1e-9
    assert abs(r.design_effect - round(total * s2 * _ESS_SCALE / (s1 * s1), 6)) < 1e-9
    assert abs(r.ess_fraction - round(ess / total, 6)) < 1e-9
    # reweighting can only lose effective samples
    assert 0 < r.ess <= total + 1e-6
    assert r.design_effect >= 1.0 - 1e-9
