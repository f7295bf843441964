"""Batch-170 tests: python replays of PPR, kNN reciprocity, two-hop
reach — each re-deriving its graph independently from raw rows."""

import collections


def _cooc_edges(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir).collect()
    byslot = collections.defaultdict(set)
    for e in ev:
        byslot[(e.event_type, e.ts.replace(minute=0, second=0,
                                           microsecond=0))].add(e.user_id)
    edges = set()
    for users in byslot.values():
        for u in users:
            for v in users:
                if u != v:
                    edges.add((u, v))
    return edges


def test_personalized_pagerank_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext175 import (
        _PPR_D,
        _PPR_ITERS,
        _PPR_SEED_MOD,
        q_personalized_pagerank,
    )

    got = {
        r.node: r.ppr
        for r in q_personalized_pagerank(spark, sf_dir).collect()
    }
    edges = _cooc_edges(spark, sf_dir)
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    seeds = {n for n in nodes if n % _PPR_SEED_MOD == 0}
    assert seeds, "seed set empty — fixture assumption broken"
    deg = collections.Counter(u for u, _ in edges)
    tele = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in nodes}
    rank = {n: round(tele[n], 9) for n in nodes}
    for _ in range(_PPR_ITERS):
        inflow = collections.defaultdict(float)
        for u, v in edges:
            inflow[v] += rank[u] / deg[u]
        rank = {
            n: round((1 - _PPR_D) * tele[n] + _PPR_D * inflow.get(n, 0.0), 9)
            for n in nodes
        }
    want = {n: round(r, 6) for n, r in rank.items()}
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 2e-6, n
    # personalization: seeds hold more rank than non-seeds on average
    savg = sum(got[n] for n in seeds) / len(seeds)
    others = [got[n] for n in nodes - seeds]
    assert savg > sum(others) / len(others)


def _knn(spark, sf_dir, k):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = [r.vec_id for r in emb]
    V = np.array([r.embedding for r in emb], dtype=float)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = np.round(Vn @ Vn.T, 6)
    out = set()
    for i, src in enumerate(ids):
        cand = sorted(
            ((S[i, j], -ids[j]) for j in range(len(ids)) if j != i),
            key=lambda t: (-t[0], -t[1]),
        )
        # ties break by SMALLER dst id: sort by (-cos, dst)
        cand = sorted(
            ((S[i, j], ids[j]) for j in range(len(ids)) if j != i),
            key=lambda t: (-t[0], t[1]),
        )
        for c, dst in cand[:k]:
            out.add((src, dst))
    return out


def test_knn_reciprocity_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext175 import (
        _TH_K,
        q_knn_reciprocity,
    )

    r = q_knn_reciprocity(spark, sf_dir).collect()[0]
    knn = _knn(spark, sf_dir, _TH_K)
    recip = sum(1 for (u, v) in knn if (v, u) in knn)
    assert r.n_edges == len(knn)
    assert r.n_reciprocated == recip
    assert abs(r.reciprocity - round(recip / len(knn), 6)) < 1e-9
    assert 0 < r.reciprocity < 1  # neither empty nor fully symmetric


def test_two_hop_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext175 import (
        _TH_K,
        q_two_hop,
    )

    got = {
        r.vec_id: (r.n_1hop, r.n_within_2hops)
        for r in q_two_hop(spark, sf_dir).collect()
    }
    knn = _knn(spark, sf_dir, _TH_K)
    mut = {(u, v) for (u, v) in knn if (v, u) in knn}
    adj = collections.defaultdict(set)
    for u, v in mut:
        adj[u].add(v)
    want = {}
    for n, nb in adj.items():
        reach = set(nb)
        for m in nb:
            reach |= adj[m]
        reach.discard(n)
        want[n] = (len(nb), len(reach))
    assert got == want
    # bounded fan-out: within-2-hop reach can never exceed k + k^2
    assert all(v[1] <= _TH_K + _TH_K * _TH_K for v in got.values())
