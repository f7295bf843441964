"""Batch-135 tests: harmonic centrality, rank aggregation, rich club —
python oracles + social-choice/graph properties."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from collections import Counter, defaultdict


def _mutual(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext89 import knn_edges_exact

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ed = {(r.a, r.b) for r in knn_edges_exact(emb, 5).collect()}
    return sorted({(a, b) for a, b in ed if (b, a) in ed and a < b})


def test_harmonic_centrality_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext140 import (
        q_harmonic_centrality,
    )

    got = [
        (r.vec_id, r.n1, r.n2, r.n3, r.harmonic_c3)
        for r in q_harmonic_centrality(spark, sf_dir).collect()
    ]
    mutual = _mutual(spark, sf_dir)
    adj = defaultdict(set)
    for u, w in mutual:
        adj[u].add(w)
        adj[w].add(u)
    rows = []
    for u in adj:
        d1 = adj[u]
        d2 = set()
        for v in d1:
            d2 |= adj[v]
        d2 -= d1 | {u}
        d3 = set()
        for v in d2:
            d3 |= adj[v]
        d3 -= d1 | d2 | {u}
        h = round(len(d1) + len(d2) / 2.0 + len(d3) / 3.0, 4)
        rows.append((u, len(d1), len(d2), len(d3), h))
    rows.sort(key=lambda r: (-r[4], r[0]))
    assert got == rows[:15]
    # BFS-level sanity: levels are disjoint by construction
    assert all(n1 >= 1 for _, n1, _, _, _ in got)


def test_rank_aggregation_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext140 import (
        q_rank_aggregation,
    )

    got = {r.source: r for r in q_rank_aggregation(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    m = defaultdict(lambda: [0, 0, set()])
    for d in docs:
        e = m[d.source]
        e[0] += 1
        e[1] += d.n_chars
        e[2].add(d.lang)
    srcs = sorted(m)
    r1 = {
        s: i + 1
        for i, s in enumerate(
            sorted(srcs, key=lambda s: (-m[s][0], s))
        )
    }
    r2 = {
        s: i + 1
        for i, s in enumerate(
            sorted(srcs, key=lambda s: (-(m[s][1] / m[s][0]), s))
        )
    }
    r3 = {
        s: i + 1
        for i, s in enumerate(
            sorted(srcs, key=lambda s: (-len(m[s][2]), s))
        )
    }
    n = len(srcs)
    borda = {s: 3 * n - (r1[s] + r2[s] + r3[s]) for s in srcs}
    wins = {}
    for a in srcs:
        wins[a] = sum(
            1
            for b in srcs
            if b != a
            and (r1[a] < r1[b]) + (r2[a] < r2[b]) + (r3[a] < r3[b]) >= 2
        )
    top10 = sorted(srcs, key=lambda s: (-borda[s], s))[:10]
    assert set(got) == set(top10)
    best_b = max(borda.values())
    for s in top10:
        r = got[s]
        assert (r.r1, r.r2, r.r3) == (r1[s], r2[s], r3[s])
        assert r.borda_score == borda[s]
        assert r.wins == wins[s]
        assert r.condorcet_winner == (wins[s] == n - 1)
        assert r.borda_winner == (borda[s] == best_b)
    # exactly one Borda winner among the full ranking (ties broken? Borda
    # scores may tie — then multiple flags; assert at least one)
    assert any(r.borda_winner for r in got.values())


def test_rich_club_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext140 import q_rich_club

    got = {r.k: r for r in q_rich_club(spark, sf_dir).collect()}
    mutual = _mutual(spark, sf_dir)
    deg = Counter()
    for u, w in mutual:
        deg[u] += 1
        deg[w] += 1
    for k in (1, 2, 3, 4):
        club = {n for n, d in deg.items() if d > k}
        if not club:
            assert k not in got
            continue
        e_k = sum(1 for u, w in mutual if u in club and w in club)
        r = got[k]
        assert r.n_k == len(club)
        assert r.e_k == e_k
        if len(club) >= 2:
            phi = 2.0 * e_k / (len(club) * (len(club) - 1))
            assert abs(r.phi - round(phi, 6)) < 1e-9
    # clubs shrink with k
    ks = sorted(got)
    sizes = [got[k].n_k for k in ks]
    assert all(a >= b for a, b in zip(sizes, sizes[1:]))
