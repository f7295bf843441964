"""Batch-130 tests: Friedman, Cronbach's alpha, price indices —
python oracles + family identities."""

import math
from collections import Counter, defaultdict


def test_friedman_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext135 import (
        q_friedman_test,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    got = {r.event_type: r for r in q_friedman_test(spark, sf_dir).collect()}
    ev = read_events(spark, sf_dir).collect()
    raw = Counter((e.ts.day, e.event_type) for e in ev)
    days = sorted({d for d, _ in raw})
    types = sorted({t for _, t in raw})
    r2_sum = defaultdict(int)
    for d in days:
        cs = {t: raw.get((d, t), 0) for t in types}
        for t in types:
            less = sum(1 for u in types if cs[u] < cs[t])
            eq = sum(1 for u in types if cs[u] == cs[t])
            r2_sum[t] += 2 * less + eq + 1
    n, k = len(days), len(types)
    sq = sum((v / 2.0) ** 2 for v in r2_sum.values())
    chi2 = 12.0 / (n * k * (k + 1)) * sq - 3.0 * n * (k + 1)
    assert set(got) == set(types)
    for t in types:
        r = got[t]
        assert r.r2_sum == r2_sum[t]
        assert abs(r.chi2_f - round(chi2, 4)) < 1e-9
        assert r.df == k - 1
    assert chi2 >= -1e-9
    # scipy cross-check when available (no ties correction differences:
    # scipy applies the tie-free formula, same as ours)
    try:
        from scipy.stats import friedmanchisquare
    except ImportError:
        return
    cols = [[raw.get((d, t), 0) for d in days] for t in types]
    stat, _ = friedmanchisquare(*cols)
    assert abs(got[types[0]].chi2_f - stat) < 0.5  # scipy tie handling differs slightly


def test_cronbach_alpha_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext135 import (
        q_cronbach_alpha,
    )

    [r] = q_cronbach_alpha(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    items = Counter((e.user_id, e.event_type) for e in ev)
    users = sorted({e.user_id for e in ev})
    types = sorted({e.event_type for e in ev})

    def var(xs):
        n = len(xs)
        s, ssq = sum(xs), sum(x * x for x in xs)
        return (ssq - s * s / n) / (n - 1)

    item_vars = [
        var([items.get((u, t), 0) for u in users]) for t in types
    ]
    totals = [sum(items.get((u, t), 0) for t in types) for u in users]
    tv = var(totals)
    k = len(types)
    alpha = k / (k - 1) * (1 - sum(item_vars) / tv)
    assert r.n_items == k
    assert r.n_users == len(users)
    assert abs(r.sum_item_var - round(sum(item_vars), 4)) < 1e-9
    assert abs(r.total_var - round(tv, 4)) < 1e-9
    assert abs(r.alpha - round(alpha, 6)) < 1e-9
    assert r.alpha <= 1.0 + 1e-9


def test_price_index_python_oracle_and_fisher_between(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext135 import (
        _PI_SPLIT,
        q_price_index,
    )
    import datetime

    [r] = q_price_index(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    split = datetime.datetime.fromisoformat(_PI_SPLIT)
    agg = defaultdict(lambda: [0, 0])
    for x in li:
        period = 0 if x.l_shipdate < split else 1
        e = agg[(x.l_partkey, period)]
        e[0] += round(x.l_quantity)
        e[1] += round(x.l_extendedprice * 100)
    p1q0 = p0q0 = p1q1 = p0q1 = 0
    n_parts = 0
    for pk in {k for k, _ in agg}:
        if (pk, 0) in agg and (pk, 1) in agg:
            q0, c0 = agg[(pk, 0)]
            q1, c1 = agg[(pk, 1)]
            if q0 > 0 and q1 > 0:
                n_parts += 1
                p1q0 += round(c1 * q0 / q1)
                p0q0 += c0
                p1q1 += c1
                p0q1 += round(c0 * q1 / q0)
    lasp = p1q0 / p0q0
    paas = p1q1 / p0q1
    assert r.n_parts == n_parts
    assert abs(r.laspeyres - round(lasp, 6)) < 1e-9
    assert abs(r.paasche - round(paas, 6)) < 1e-9
    assert abs(r.fisher - round(math.sqrt(lasp * paas), 6)) < 1e-9
    # Fisher is the geometric mean: strictly between (or equal to) the two
    lo, hi = sorted((r.laspeyres, r.paasche))
    assert lo - 1e-9 <= r.fisher <= hi + 1e-9
