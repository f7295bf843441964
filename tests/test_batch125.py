"""Batch-125 tests: ARI, log-rank, adversarial validation — python
oracles + design properties."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import Counter, defaultdict

_P = 2147483647


def test_ari_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.operators import centroids
    from arrow_supercluster_spark.plans.registry_ext130 import (
        q_ari_clustering,
    )

    [r] = q_ari_clustering(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cont = {
        (c.label, c.assigned): c.n_vecs
        for c in centroids.nearest_centroid(
            emb, centroids.label_centroids(emb)
        ).collect()
    }
    n = sum(cont.values())
    sum_ij = sum(v * (v - 1) // 2 for v in cont.values())
    a = Counter()
    b = Counter()
    for (t, p), v in cont.items():
        a[t] += v
        b[p] += v
    sum_a = sum(v * (v - 1) // 2 for v in a.values())
    sum_b = sum(v * (v - 1) // 2 for v in b.values())
    e = sum_a * sum_b / (n * (n - 1) / 2)
    ari = (sum_ij - e) / ((sum_a + sum_b) / 2 - e)
    assert r.n_points == n
    assert (r.sum_ij, r.sum_a, r.sum_b) == (sum_ij, sum_a, sum_b)
    assert abs(r.ari - round(ari, 6)) < 1e-9
    # sklearn cross-check when available
    try:
        from sklearn.metrics import adjusted_rand_score
    except ImportError:
        return
    true_l, pred_l = [], []
    for (t, p), v in cont.items():
        true_l += [t] * v
        pred_l += [p] * v
    assert abs(r.ari - adjusted_rand_score(true_l, pred_l)) < 1e-4


def test_logrank_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext130 import (
        _LR_SCALE,
        q_logrank_test,
    )
    from arrow_supercluster_spark.sources.tables import read_events

    [r] = q_logrank_test(spark, sf_dir).collect()
    ev = read_events(spark, sf_dir).collect()
    firsts = {}
    for e in ev:
        if e.event_type == "purchase":
            d = e.ts.day
            u = e.user_id
            firsts[u] = min(firsts.get(u, 99), d)
    users = {e.user_id for e in ev}
    durations = [
        (u % 2, firsts.get(u, 31), 1 if u in firsts else 0) for u in users
    ]
    times = sorted({t for _, t, ev_ in durations if ev_})
    oe_s = vr_s = 0
    n_times = 0
    for t in times:
        d1 = sum(1 for g, tt, e_ in durations if g == 1 and tt == t and e_)
        dt = sum(1 for _, tt, e_ in durations if tt == t and e_)
        n1 = sum(1 for g, tt, _ in durations if g == 1 and tt >= t)
        nt = sum(1 for _, tt, _ in durations if tt >= t)
        if dt == 0 or nt <= dt:
            continue
        n_times += 1
        oe_s += round((d1 - dt * n1 / nt) * _LR_SCALE)
        vr_s += round(
            dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1) * _LR_SCALE
        )
    oe = oe_s / _LR_SCALE
    vr = vr_s / _LR_SCALE
    assert r.n_times == n_times
    assert abs(r.o_minus_e - round(oe, 4)) < 1e-9
    assert abs(r.variance - round(vr, 4)) < 1e-9
    assert abs(r.chi2 - round(oe * oe / vr, 4)) < 1e-9
    assert r.chi2 >= 0


def test_adversarial_validation_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext130 import (
        _AV_THRESHOLDS,
        q_adversarial_validation,
    )

    got = {
        r.split: r.best_bacc
        for r in q_adversarial_validation(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for name in ("hash", "by_source"):
        best = 0.0
        for thr in _AV_THRESHOLDS:
            nb = nb_hit = na = na_hit = 0
            for d in docs:
                if name == "hash":
                    is_b = (
                        ((d.doc_id % _P) * 2654435761 + 12345) % _P % 10 == 0
                    )
                else:
                    is_b = d.source in ("src0", "src1")
                if is_b:
                    nb += 1
                    nb_hit += d.n_chars >= thr
                else:
                    na += 1
                    na_hit += d.n_chars < thr
            bacc = 0.5 * nb_hit / nb + 0.5 * na_hit / na
            best = max(best, bacc, 1.0 - bacc)
        assert abs(got[name] - round(best, 6)) < 1e-9
    # the hash split must look indistinguishable; nothing stops the
    # by-source split from doing the same on THIS corpus, but the hash
    # split must never look WORSE than the deliberately skewed one
    assert got["hash"] < 0.6
    assert got["hash"] <= got["by_source"] + 1e-9
