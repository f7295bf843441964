"""Batch-133 tests: RDP simplification, topic coherence, Weibull fit —
python oracles + guarantees."""

import math
import re
from collections import Counter, defaultdict


def test_rdp_python_oracle_and_epsilon_guarantee(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext138 import (
        _RDP_EPS,
        q_rdp_simplify,
        rdp,
    )
    from arrow_supercluster_spark.sources.points import derived_points

    got = {r.city: r for r in q_rdp_simplify(spark, sf_dir).collect()}
    pts = [
        p
        for p in derived_points(spark, sf_dir).collect()
        if p.lng is not None
    ]
    chains = defaultdict(list)
    for p in pts:
        chains[p.city].append((p.id, p.lng, p.lat))
    assert set(got) == set(chains)
    for city, rows in chains.items():
        rows.sort()
        xy = [(x, y) for _, x, y in rows]
        kept = rdp(xy, _RDP_EPS)
        r = got[city]
        assert r.n_points == len(xy)
        assert r.n_kept == len(kept)
        assert abs(r.kept_ratio - round(len(kept) / len(xy), 6)) < 1e-9
        # the RDP guarantee: every dropped vertex within eps of the
        # simplified chain (recomputed independently here)
        for a, b in zip(kept, kept[1:]):
            x1, y1 = xy[a]
            x2, y2 = xy[b]
            dx, dy = x2 - x1, y2 - y1
            norm = math.hypot(dx, dy)
            for k in range(a + 1, b):
                xk, yk = xy[k]
                d = (
                    math.hypot(xk - x1, yk - y1)
                    if norm == 0
                    else abs(dy * (xk - x1) - dx * (yk - y1)) / norm
                )
                assert d <= _RDP_EPS + 1e-9
        assert r.max_dropped_err <= _RDP_EPS + 1e-9
        # it must actually simplify a global scatter
        assert r.n_kept < r.n_points


def test_rdp_known_shapes():
    from arrow_supercluster_spark.plans.registry_ext138 import rdp

    # straight line: only endpoints survive
    line = [(float(i), 2.0 * i) for i in range(10)]
    assert rdp(line, 0.01) == [0, 9]
    # a sharp corner survives
    corner = [(0.0, 0.0), (5.0, 0.0), (5.0, 5.0)]
    assert rdp(corner, 0.5) == [0, 1, 2]


def test_topic_coherence_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext138 import (
        _TC_SCALE,
        _TC_TOP,
        q_topic_coherence,
    )

    got = {r.source: r for r in q_topic_coherence(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    doc_toks = {}
    for d in docs:
        t = re.sub(r"\s+", " ", d.text.strip().lower())
        doc_toks[d.doc_id] = (d.source, set(x for x in t.split(" ") if x))
    nd = len(docs)
    n_src = len({s for s, _ in doc_toks.values()})
    src_tf, src_df_set, tok_df = Counter(), defaultdict(set), Counter()
    for did, (src, toks) in doc_toks.items():
        for tok in toks:
            src_tf[(src, tok)] += 1
            src_df_set[tok].add(src)
            tok_df[tok] += 1
    top = defaultdict(list)
    for (src, tok), tf in src_tf.items():
        score = round(tf * math.log(n_src / len(src_df_set[tok]) + 1.0) * 1e6)
        top[src].append((-score, tok))
    for src in top:
        top[src] = [t for _, t in sorted(top[src])[:_TC_TOP]]
    for src, terms in top.items():
        npmis = []
        for i, ta in enumerate(sorted(terms)):
            for tb in sorted(terms)[i + 1 :]:
                co = sum(
                    1
                    for _, (s, toks) in doc_toks.items()
                    if ta in toks and tb in toks
                )
                if co == 0:
                    v = -1.0
                else:
                    v = math.log(
                        co * nd / (tok_df[ta] * tok_df[tb])
                    ) / (-math.log(co / nd))
                npmis.append(round(v * _TC_SCALE))
        r = got[src]
        assert r.n_pairs == len(npmis)
        assert abs(
            r.coherence - round(sum(npmis) / (_TC_SCALE * len(npmis)), 6)
        ) < 1e-9
        assert -1.0 - 1e-9 <= r.coherence <= 1.0 + 1e-9


def test_weibull_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext138 import (
        _WB_SCALE,
        q_weibull_fit,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_weibull_fit(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    firsts = {}
    for e in ev:
        if e.event_type == "purchase":
            firsts[e.user_id] = min(
                firsts.get(e.user_id, 99), e.ts.day
            )
    ts = sorted(firsts.values())
    n = len(ts)
    by_t = Counter(ts)
    cum = 0
    pts = []
    for t in sorted(by_t):
        cum += by_t[t]
        fhat = (cum - 0.3) / (n + 0.4)
        x = round(math.log(t) * _WB_SCALE)
        y = round(math.log(-math.log(1 - fhat)) * _WB_SCALE)
        pts.append((x, y))
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(round(x * y / _WB_SCALE) for x, y in pts)
    sxx = sum(round(x * x / _WB_SCALE) for x, _ in pts)
    slope = (sxy - sx * sy / (_WB_SCALE * k)) / (sxx - sx * sx / (_WB_SCALE * k))
    inter = sy / (_WB_SCALE * k) - slope * sx / (_WB_SCALE * k)
    assert r.n_points == k
    assert abs(r.shape_k - round(slope, 6)) < 1e-9
    assert abs(r.scale_lambda - round(math.exp(-inter / slope), 4)) < 1e-9
    # sanity: shape positive, scale within the observation window scale
    assert r.shape_k > 0
    assert 0 < r.scale_lambda < 100
