"""Batch-132 tests: graph modularity, interrupted TS, two-way ANOVA —
python oracles + identities."""

import math
from collections import Counter, defaultdict


def test_modularity_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext89 import knn_edges_exact
    from arrow_supercluster_spark.plans.registry_ext137 import (
        q_graph_modularity,
    )

    got = {r.label: r for r in q_graph_modularity(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {e.vec_id: e.label for e in emb.collect()}
    ed = {(r.a, r.b) for r in knn_edges_exact(emb, 5).collect()}
    mutual = sorted({(a, b) for a, b in ed if (b, a) in ed and a < b})
    m = len(mutual)
    e_in, deg = Counter(), Counter()
    for u, w in mutual:
        cu, cw = labels[u], labels[w]
        deg[cu] += 1
        deg[cw] += 1
        if cu == cw:
            e_in[cu] += 1
    q = sum(
        e_in.get(l, 0) / m - (deg[l] * 0.5 / m) ** 2 for l in deg
    )
    assert set(got) == set(deg)
    for l in deg:
        r = got[l]
        assert r.e_in == e_in.get(l, 0)
        assert r.deg == deg[l]
        assert abs(r.modularity_q - round(q, 6)) < 1e-9
    # modularity is bounded: Q in [-0.5, 1)
    anyr = next(iter(got.values()))
    assert -0.5 - 1e-9 <= anyr.modularity_q < 1.0


def test_interrupted_ts_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext137 import (
        _ITS_DAY,
        q_interrupted_ts,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_interrupted_ts(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    daily = Counter(e.ts.day for e in ev)

    def fit(pairs):
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        inter = sy / n - slope * sx / n
        return slope, inter

    pre = [(d, c) for d, c in daily.items() if d < _ITS_DAY]
    post = [(d, c) for d, c in daily.items() if d >= _ITS_DAY]
    sp, ip = fit(pre)
    sq, iq = fit(post)
    assert abs(r.slope_pre - round(sp, 6)) < 1e-9
    assert abs(r.slope_post - round(sq, 6)) < 1e-9
    assert abs(r.intercept_pre - round(ip, 4)) < 1e-9
    assert abs(
        r.level_change_at_d
        - round((iq + sq * _ITS_DAY) - (ip + sp * _ITS_DAY), 4)
    ) < 1e-9
    assert abs(r.slope_change - round(sq - sp, 6)) < 1e-9


def test_twoway_anova_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext137 import (
        q_twoway_anova,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_twoway_anova(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    cells = defaultdict(list)
    for e in ev:
        # python weekday(): Monday=0; engines use Sunday=0 — convert
        b = (e.ts.weekday() + 1) % 7
        cells[(e.event_type, b)].append(round(e.value * 100))
    gs = sum(sum(v) for v in cells.values())
    gn = sum(len(v) for v in cells.values())
    gssq = sum(sum(x * x for x in v) for v in cells.values())
    ta = tb = tc = 0.0
    amarg, bmarg = defaultdict(lambda: [0, 0]), defaultdict(lambda: [0, 0])
    for (a, b), v in cells.items():
        tc += sum(v) ** 2 / len(v)
        amarg[a][0] += len(v)
        amarg[a][1] += sum(v)
        bmarg[b][0] += len(v)
        bmarg[b][1] += sum(v)
    ta = sum(s * s / n for n, s in amarg.values())
    tb = sum(s * s / n for n, s in bmarg.values())
    g = gs * gs / gn
    ss_a, ss_b = ta - g, tb - g
    ss_ab = tc - ta - tb + g
    ss_w = gssq - tc
    ka, kb, kc = len(amarg), len(bmarg), len(cells)
    assert (r.levels_a, r.levels_b, r.n) == (ka, kb, gn)
    assert abs(r.ss_a - round(ss_a / 1e4, 2)) < 1e-6
    assert abs(r.ss_b - round(ss_b / 1e4, 2)) < 1e-6
    assert abs(r.ss_interaction - round(ss_ab / 1e4, 2)) < 1e-6
    assert abs(r.ss_within - round(ss_w / 1e4, 2)) < 1e-6
    f_a = (ss_a / (ka - 1)) / (ss_w / (gn - kc))
    assert abs(r.f_a - round(f_a, 4)) < 1e-6
    # all SS components non-negative up to rounding
    assert r.ss_within > 0 and r.ss_a >= -0.01 and r.ss_b >= -0.01
