"""Batch-109 tests: URL/domain rollup, KMV sketch, Adamic-Adar —
python oracles independent of both engines."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import math
from collections import defaultdict

from pyspark.sql import functions as F

_P = 2147483647


def test_url_domain_rollup_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext114 import (
        q_url_domain_rollup,
    )

    got = {r.host: r for r in q_url_domain_rollup(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    per_host = defaultdict(list)
    for d in docs:
        per_host[f"{d.source}.example.org"].append(d)
    assert set(got) == set(per_host)
    for host, rows in per_host.items():
        r = got[host]
        assert r.domain == "example.org"
        assert r.n_docs == len(rows)
        assert r.n_langs == len({d.lang for d in rows})
        assert r.n_refs == len({d.doc_id % 7 for d in rows})
        assert abs(
            r.mean_chars - round(sum(d.n_chars for d in rows) / len(rows), 4)
        ) < 1e-9
        assert r.first_path == min(
            f"/{d.lang}/doc-{d.doc_id}" for d in rows
        )


def _kmv_hash(elem):
    return (2654435761 * (elem % _P) + 12345) % _P


def test_kmv_sketch_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext114 import (
        _KMV_K,
        q_kmv_sketch,
    )

    got = {r.set_name: r for r in q_kmv_sketch(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    sets = {"click": set(), "view": set()}
    for e in ev:
        if e.event_type in sets:
            sets[e.event_type].add(
                _kmv_hash(e.user_id * 100003 + math.floor(e.value * 10))
            )
    sets["union"] = sets["click"] | sets["view"]
    sk = {n: sorted(s)[:_KMV_K] for n, s in sets.items()}
    for n, s in sets.items():
        r = got[n]
        assert r.n_exact == len(s)
        est = (_KMV_K - 1) * _P / sk[n][-1]
        assert abs(r.est_distinct - round(est, 4)) < 1e-9
        # the estimator should actually estimate: within 50% at k=64
        assert r.rel_error < 0.5
    jac = sum(
        1
        for h in sk["union"]
        if h in set(sk["click"]) and h in set(sk["view"])
    ) / _KMV_K
    assert abs(got["click"].jaccard_est - round(jac, 4)) < 1e-9
    # sanity: true jaccard within 0.25 of the estimate at k=64
    true_jac = len(sets["click"] & sets["view"]) / len(sets["union"])
    assert abs(jac - true_jac) < 0.25


def test_adamic_adar_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext114 import (
        _AA_ITEMS,
        q_adamic_adar,
    )
    import json

    got = q_adamic_adar(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    ui = {(e.user_id, json.loads(e.props)["k"] % _AA_ITEMS) for e in ev}
    items_of = defaultdict(set)
    for u, i in ui:
        items_of[u].add(i)
    scores = defaultdict(lambda: [0, 0.0])
    for u, items in items_of.items():
        d = len(items)
        if d < 2:
            continue
        for i in items:
            for j in items:
                if i < j:
                    scores[(i, j)][0] += 1
                    scores[(i, j)][1] += 1.0 / math.log(d)
    ranked = sorted(
        scores.items(), key=lambda kv: (-round(kv[1][1], 4), kv[0])
    )[:25]
    assert len(got) == len(ranked)
    for r, ((i, j), (cu, sc)) in zip(got, ranked):
        assert (r.item_i, r.item_j) == (i, j)
        assert r.common_users == cu
        assert abs(r.aa_score - round(sc, 4)) < 1e-9


def test_kmv_sketch_plan_has_no_global_sort(spark, sf_dir):
    """The k-smallest cut must be TakeOrderedAndProject (distributed
    partial top-k), not a global Sort feeding a single-partition
    limit."""
    from arrow_supercluster_spark.plans.registry_ext114 import q_kmv_sketch

    plan = (
        q_kmv_sketch(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
