"""Batch-84 tests: prefix-filtered set-similarity join completeness, DP
count properties, k-core Python-peeling parity."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import collections
import tempfile

from pyspark.sql import functions as F


def test_setsim_join_equals_bruteforce(spark):
    """The prefix filter must be LOSSLESS: compare the filtered plan
    against an in-Python all-pairs scan on docs crafted to sit around
    the threshold (including an exactly-at-0.6 pair)."""
    from arrow_supercluster_spark.plans.registry_ext89 import (
        _T,
        q_setsim_join,
    )

    rows = [
        (1, "a b c d e"),
        (2, "a b c d f"),      # J(1,2) = 4/6 = 0.667 ≥ t
        (3, "a b c x y"),      # J(1,3) = 3/7 < t
        (4, "a b c d e"),      # J(1,4) = 1
        (5, "p q r"),          # J(5,6) = 3/5 = 0.6 == t (boundary kept)
        (6, "p q r s t"),
        (7, "zz yy"),          # isolated
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            (r.a_id, r.b_id): r.jaccard
            for r in q_setsim_join(spark, d).collect()
        }
    sets = {i: set(t.split()) for i, t in rows}
    want = {}
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j:
                inter = len(sets[i] & sets[j])
                uni = len(sets[i] | sets[j])
                if inter / uni >= _T:
                    want[(i, j)] = round(inter / uni, 6)
    assert got == want
    assert (5, 6) in got  # the boundary pair survived


def test_dp_counts_noise_bounded_and_deterministic(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext89 import (
        _EPS,
        _H_MOD,
        q_dp_counts,
    )
    import math

    a = q_dp_counts(spark, sf_dir).collect()
    b = q_dp_counts(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # seeded = stable
    # |Laplace noise| <= (1/eps) * ln(H_MOD) given the u grid never hits
    # the distribution tails beyond 1/(2*H_MOD)
    bound = (1.0 / _EPS) * math.log(_H_MOD)
    for r in a:
        assert abs(r.noisy_n - r.true_n) <= bound
    # noise actually moves counts (not the identity release)
    assert any(abs(r.noisy_n - r.true_n) > 1e-9 for r in a)


def test_kcore_matches_python_peeling(spark, sf_dir):
    """Full core-number parity against independent Python peeling of the
    same mutual-kNN graph."""
    from arrow_supercluster_spark.plans.registry_ext89 import (
        _KNN_K,
        knn_edges_exact,
        q_kcore,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ed = knn_edges_exact(emb, _KNN_K)
    E = {(r.a, r.b) for r in ed.collect()}
    adj = collections.defaultdict(set)
    for a, b in E:
        if (b, a) in E:
            adj[a].add(b)
            adj[b].add(a)
    live = {n: set(s) for n, s in adj.items()}
    core = {}
    k = 1
    while live:
        while True:
            drop = [n for n, s in live.items() if len(s) < k]
            if not drop:
                break
            for n in drop:
                for m in live[n]:
                    live[m].discard(n)
                core[n] = k - 1
                del live[n]
        k += 1
    got = {
        r.node_id: r.core_number for r in q_kcore(spark, sf_dir).collect()
    }
    assert got == core
    assert len(set(core.values())) > 1, "core numbers must form a gradient"


def test_setsim_join_prefix_path_on_wide_vocab(spark):
    """A >62-token vocabulary must route to the PREFIX-FILTER path and
    still match the python all-pairs oracle (the round-5 bitmask fast
    path only covers dense domains)."""
    import random

    from arrow_supercluster_spark.plans.registry_ext89 import (
        _BITMASK_MAX_VOCAB,
        _T,
        q_setsim_join,
    )

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(100)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, 8)
        rows.append((i, " ".join(base)))
        if i % 3 == 0:  # a near-duplicate neighbour above the threshold
            mutated = list(base)
            mutated[-1] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(mutated)))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            (r.a_id, r.b_id): r.jaccard
            for r in q_setsim_join(spark, d).collect()
        }
    sets = {i: set(t.split()) for i, t in rows}
    assert len(set().union(*sets.values())) > _BITMASK_MAX_VOCAB
    want = {}
    for i in sorted(sets):
        for j in sorted(sets):
            if i < j:
                inter = len(sets[i] & sets[j])
                uni = len(sets[i] | sets[j])
                if inter / uni >= _T:
                    want[(i, j)] = round(inter / uni, 6)
    assert got == want
    assert want  # the crafted near-dups actually qualify


def test_setsim_bitmask_and_prefix_paths_agree(spark, monkeypatch):
    """Both paths on the SAME corpus (vocab ≤ 62, so the bitmask path is
    the default; the prefix path is forced by shrinking the cutoff)
    must return the identical pair set."""
    from arrow_supercluster_spark.plans import registry_ext89 as m

    rows = [(i, " ".join(f"t{(i * 7 + k * 3) % 20}" for k in range(6)))
            for i in range(40)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(f"{d}/documents.parquet")
        fast = {
            (r.a_id, r.b_id): r.jaccard
            for r in m.q_setsim_join(spark, d).collect()
        }
        monkeypatch.setattr(m, "_BITMASK_MAX_VOCAB", 0)
        slow = {
            (r.a_id, r.b_id): r.jaccard
            for r in m.q_setsim_join(spark, d).collect()
        }
    assert fast == slow
    assert fast  # non-degenerate corpus


def test_setsim_dispatch_probe_is_bounded(spark, monkeypatch):
    """The path-dispatch probe must collect <= _BITMASK_MAX_VOCAB + 1
    rows even when the corpus vocabulary is far wider (VERDICT r5
    "What's wrong #1": the r5 dispatch collected the FULL distinct
    vocabulary before testing its size).  Wrap DataFrame.collect and
    record every driver-side materialization the plan function makes."""
    from pyspark.sql.classic.dataframe import DataFrame

    from arrow_supercluster_spark.plans import registry_ext89 as m

    vocab = [f"w{i:04d}" for i in range(500)]  # >> 62
    rows = [
        (i, " ".join(vocab[(i * 13 + k) % len(vocab)] for k in range(9)))
        for i in range(80)
    ]
    collected = []
    orig = DataFrame.collect

    def spy(self):
        out = orig(self)
        collected.append(len(out))
        return out

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(f"{d}/documents.parquet")
        monkeypatch.setattr(DataFrame, "collect", spy)
        m.q_setsim_join(spark, d)  # plan construction runs the probe
    assert collected, "the dispatch probe should have run"
    assert max(collected) <= m._BITMASK_MAX_VOCAB + 1, (
        f"dispatch moved {max(collected)} rows to the driver; the probe "
        f"must cap at {m._BITMASK_MAX_VOCAB + 1}"
    )


def test_setsim_mask_cap_falls_back_to_prefix(spark, monkeypatch):
    """r6 guard: a dense (vocab <= 62) corpus whose DISTINCT-MASK count
    exceeds _BITMASK_MAX_MASKS must route to the prefix path, and the
    result must equal the unguarded bitmask output pair-for-pair."""
    from arrow_supercluster_spark.plans import registry_ext89 as m

    # 40 docs over a 20-token vocab with ~40 distinct token subsets
    rows = [(i, " ".join(f"t{(i * 7 + k * 3) % 20}" for k in range(6)))
            for i in range(40)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(f"{d}/documents.parquet")
        fast = {
            (r.a_id, r.b_id): r.jaccard
            for r in m.q_setsim_join(spark, d).collect()
        }
        # force the cap below the corpus's distinct-mask count: the
        # bitmask path must decline (return None) and the dispatcher
        # must fall back to the prefix path
        monkeypatch.setattr(m, "_BITMASK_MAX_MASKS", 4)
        guarded = {
            (r.a_id, r.b_id): r.jaccard
            for r in m.q_setsim_join(spark, d).collect()
        }
    assert guarded == fast
    assert fast  # non-degenerate corpus


def test_setsim_bitmask_declines_above_mask_cap(spark, monkeypatch):
    """The guard itself: _setsim_bitmask must return None (not compute
    the O(M^2) pair stage) when distinct masks exceed the cap."""
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.operators.dedup import tokenize
    from arrow_supercluster_spark.plans import registry_ext89 as m

    rows = [(i, " ".join(f"t{(i * 7 + k * 3) % 20}" for k in range(6)))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sets0 = docs.select(
        "doc_id", F.array_distinct(tokenize(F.col("text"))).alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("sz")).filter(
        F.col("sz") > 0
    )
    vocab = sorted(
        r.tok for r in
        sets0.select(F.explode("toks").alias("tok")).distinct().collect()
    )
    monkeypatch.setattr(m, "_BITMASK_MAX_MASKS", 4)
    assert m._setsim_bitmask(spark, sets0, vocab) is None
    monkeypatch.setattr(m, "_BITMASK_MAX_MASKS", 1 << 14)
    assert m._setsim_bitmask(spark, sets0, vocab) is not None
