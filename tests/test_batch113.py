"""Batch-113 tests: recursive CTE, Wilson ranking, Kruskal-Wallis —
python oracles + structural properties."""

import math
from collections import Counter, defaultdict


def test_recursive_cte_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext118 import (
        q_recursive_cte,
    )

    got = {r.depth: r for r in q_recursive_cte(spark, sf_dir).collect()}
    cust = [
        c.c_custkey
        for c in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    ]
    keys = set(cust)
    depth_of = {0: 0}
    frontier = [0]
    d = 0
    # BFS the node -> node//2 tree
    children = defaultdict(list)
    for k in keys:
        if k >= 1:
            children[k // 2].append(k)
    while frontier:
        nxt = []
        for n in frontier:
            for c in children.get(n, ()):
                depth_of[c] = d + 1
                nxt.append(c)
        frontier = nxt
        d += 1
    per_depth = defaultdict(list)
    for n, dd in depth_of.items():
        per_depth[dd].append(n)
    assert set(got) == set(per_depth)
    for dd, nodes in per_depth.items():
        r = got[dd]
        assert r.n_nodes == len(nodes)
        assert r.min_node == min(nodes)
        assert r.max_node == max(nodes)
    # every customer reached exactly once
    assert sum(r.n_nodes for r in got.values()) == len(depth_of)
    assert len(depth_of) == len([k for k in keys if k >= 1]) + 1


def test_wilson_ranking_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext118 import (
        _WILSON_Z,
        q_wilson_ranking,
    )

    got = q_wilson_ranking(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user = defaultdict(lambda: [0, 0])
    for e in ev:
        if e.event_type == "click":
            per_user[e.user_id][0] += 1
        if e.event_type in ("click", "view"):
            per_user[e.user_id][1] += 1
    z = _WILSON_Z
    scored = []
    for u, (s, t) in per_user.items():
        if t == 0:
            continue
        p = s * 1.0 / t
        lb = (
            p + z * z / (2.0 * t)
            - z * math.sqrt((p * (1.0 - p) + z * z / (4.0 * t)) / t)
        ) / (1.0 + z * z / t)
        scored.append((u, s, t, round(p, 6), round(lb, 6)))
    scored.sort(key=lambda r: (-r[4], r[0]))
    want = scored[:10]
    assert len(got) == len(want)
    for r, (u, s, t, p, lb) in zip(got, want):
        assert (r.user_id, r.successes, r.trials) == (u, s, t)
        assert abs(r.naive_rate - p) < 1e-9
        assert abs(r.wilson_lb - lb) < 1e-9
    # LB always below the naive rate, never negative on this corpus
    for r in got:
        assert r.wilson_lb <= r.naive_rate + 1e-12
        assert r.wilson_lb >= 0


def test_kruskal_wallis_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext118 import (
        q_kruskal_wallis,
    )

    [r] = q_kruskal_wallis(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    vals = [(e.event_type, round(e.value * 100)) for e in ev]
    ties = Counter(c for _, c in vals)
    cum_less = {}
    acc = 0
    for c in sorted(ties):
        cum_less[c] = acc
        acc += ties[c]
    r2_of = {c: 2 * cum_less[c] + ties[c] + 1 for c in ties}
    groups = defaultdict(lambda: [0, 0])
    for t, c in vals:
        groups[t][0] += 1
        groups[t][1] += r2_of[c]
    n = sum(g[0] for g in groups.values())
    sq = sum((g[1] / 2.0) ** 2 / g[0] for g in groups.values())
    h = 12.0 / (n * (n + 1)) * sq - 3.0 * (n + 1)
    t3 = sum(t**3 - t for t in ties.values())
    c_tie = 1.0 - t3 / (n**3 - n)
    assert r.df == len(groups) - 1
    assert r.n == n
    assert abs(r.h_stat - round(h, 6)) < 1e-9
    assert abs(r.h_corrected - round(h / c_tie, 6)) < 1e-9
    assert abs(r.tie_correction - round(c_tie, 8)) < 1e-9
    assert r.h_stat >= 0
    # scipy cross-check when available
    try:
        from scipy.stats import kruskal
    except ImportError:
        return
    samples = defaultdict(list)
    for t, c in vals:
        samples[t].append(c)
    h_scipy, _ = kruskal(*samples.values())
    assert abs(r.h_corrected - h_scipy) < 1e-3


def test_kruskal_wallis_plan_has_no_unpartitioned_window(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext118 import (
        q_kruskal_wallis,
    )

    plan = (
        q_kruskal_wallis(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
