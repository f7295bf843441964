"""Batch-121 tests: matryoshka eval, percolation curve, Misra-Gries —
python oracles + sketch-bound verification."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import Counter, defaultdict


def test_matryoshka_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext126 import (
        _MAT_K,
        _MAT_QUERIES,
        _MAT_WIDTHS,
        q_matryoshka_eval,
    )

    got = {r.width: r for r in q_matryoshka_eval(spark, sf_dir).collect()}
    emb = {
        e.vec_id: [float(x) for x in e.embedding]
        for e in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }

    def topk(width):
        out = {}
        for q in range(_MAT_QUERIES):
            qv = emb[q][:width]
            qn = math.sqrt(sum(x * x for x in qv))
            scored = []
            for c, cv_full in emb.items():
                if c == q:
                    continue
                cv = cv_full[:width]
                num = sum(x * y for x, y in zip(qv, cv))
                cn = math.sqrt(sum(x * x for x in cv))
                scored.append(
                    (round(num / (qn * cn) * 1e9), c)
                )
            scored.sort(key=lambda s: (-s[0], s[1]))
            out[q] = {c for _, c in scored[:_MAT_K]}
        return out

    full = topk(64)
    for w in _MAT_WIDTHS:
        tr = topk(w)
        hits = sum(len(full[q] & tr[q]) for q in full)
        r = got[w]
        assert r.total_hits == hits
        assert abs(
            r.mean_recall - round(hits / (_MAT_QUERIES * _MAT_K), 4)
        ) < 1e-9
    # recall improves (weakly) with width and the full-width self-test
    # would be 1.0 — the widest prefix must do best
    recalls = [got[w].mean_recall for w in sorted(_MAT_WIDTHS)]
    assert recalls[-1] >= recalls[0]
    assert recalls[-1] > 0.1


def test_percolation_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext89 import knn_edges_exact
    from arrow_supercluster_spark.plans.registry_ext126 import (
        q_percolation_curve,
    )

    got = {r.k_removed: r for r in q_percolation_curve(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ed = {(r.a, r.b) for r in knn_edges_exact(emb, 5).collect()}
    mutual = sorted(
        {(a, b) for a, b in ed if (b, a) in ed and a < b}
    )
    deg = Counter()
    for a, b in mutual:
        deg[a] += 1
        deg[b] += 1
    for k in (0, 5, 10, 20):
        removed = set(
            n for n, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        )
        surv = [
            (a, b) for a, b in mutual if a not in removed and b not in removed
        ]
        r = got[k]
        assert r.n_edges == len(surv)
        if not surv:
            assert r.largest_cc == 0
            continue
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in surv:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp = Counter(find(x) for x in parent)
        assert r.n_nodes == len(parent)
        assert r.largest_cc == max(comp.values())
        assert abs(
            r.largest_frac - round(max(comp.values()) / len(parent), 4)
        ) < 1e-9
    # removing hubs can only shrink (or hold) the giant component
    sizes = [got[k].largest_cc for k in (0, 5, 10, 20)]
    assert all(a >= b for a, b in zip(sizes, sizes[1:]))


def test_misra_gries_bound_and_merge(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext126 import (
        _MG_K,
        q_misra_gries,
    )

    rows = q_misra_gries(spark, sf_dir).collect()
    assert rows, "sketch must surface at least one heavy hitter"
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    true = Counter()
    for d in docs:
        t = re.sub(r"\s+", " ", d.text.strip().lower())
        true.update(x for x in t.split(" ") if x)
    n = sum(true.values())
    for r in rows:
        assert r.true_count == true[r.tok]
        # the MG deterministic guarantee, re-derived independently
        assert r.true_count - n / _MG_K <= r.mg_estimate <= r.true_count
        assert r.bound_holds
        assert r.underestimate == r.true_count - r.mg_estimate
    # every TRUE heavy hitter (freq > n/k) must be present in the sketch
    surfaced = {r.tok for r in rows}
    for tok, c in true.items():
        if c > n / _MG_K:
            assert tok in surfaced, (tok, c)


def test_misra_gries_merge_rule_properties():
    from arrow_supercluster_spark.plans.registry_ext126 import (
        merge_mg,
        misra_gries_partition,
    )

    s1 = misra_gries_partition(list("aaabbc"), 3)
    s2 = misra_gries_partition(list("aacbbb"), 3)
    merged = merge_mg([s1, s2], 3)
    # merged estimates never exceed true combined counts
    true = Counter("aaabbc" + "aacbbb")
    for t, est in merged.items():
        assert est <= true[t]


def test_misra_gries_driver_collects_are_bounded(spark, sf_dir, monkeypatch):
    """Every driver-side materialization inside q_misra_gries must stay
    within sketch bounds — per-partition summaries <= n_partitions*_MG_K
    and exact-verify rows <= _MG_K — regardless of corpus vocabulary
    (VERDICT r5 "What's wrong #2": the r5 verify collected the full
    exact token-count table)."""
    from pyspark.sql import functions as F
    from pyspark.sql.classic.dataframe import DataFrame

    from arrow_supercluster_spark.plans.registry_ext126 import (
        _MG_K,
        q_misra_gries,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from arrow_supercluster_spark.operators.dedup import tokenize

    n_vocab = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("t"))
        .filter(F.col("t") != "").distinct().count()
    )
    assert n_vocab > _MG_K, "fixture corpus must out-size the sketch"

    collected = []
    orig = DataFrame.collect

    def spy(self):
        out = orig(self)
        collected.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy)
    q_misra_gries(spark, sf_dir)
    monkeypatch.undo()
    n_parts = spark.sparkContext.defaultParallelism
    bound = max(_MG_K, n_parts * _MG_K)
    assert collected and max(collected) <= bound, (
        f"driver collect of {max(collected)} rows exceeds the sketch "
        f"bound {bound} (vocab {n_vocab})"
    )
