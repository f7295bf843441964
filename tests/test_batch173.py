"""Batch-173 tests: python replays of the null/normalization semantics
operators."""


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").collect()


def _key(doc_id):
    return None if doc_id % 7 == 0 else doc_id % 50


def test_null_safe_join_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext178 import (
        q_null_safe_join,
    )

    r = q_null_safe_join(spark, sf_dir).collect()[0]
    keyed = [(d.doc_id, _key(d.doc_id)) for d in _docs(spark, sf_dir)]
    eq = sum(
        1
        for i, (da, ka) in enumerate(keyed)
        for db, kb in keyed
        if ka is not None and ka == kb and da < db
    )
    nulls = sum(1 for _, k in keyed if k is None)
    nsafe = eq + nulls * (nulls - 1) // 2
    assert r.eq_pairs == eq
    assert r.null_safe_pairs == nsafe
    assert r.n_null_keys == nulls
    assert r.null_matched_pairs == nulls * (nulls - 1) // 2
    assert r.identity_holds
    assert nulls > 0  # the fixture exercises the null branch


def test_not_in_nulls_trap(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext178 import (
        q_not_in_nulls,
    )

    r = q_not_in_nulls(spark, sf_dir).collect()[0]
    docs = _docs(spark, sf_dir)
    keys = {_key(d.doc_id) for d in docs}
    probe = [d.doc_id % 50 for d in docs if d.doc_id % 3 == 0]
    # three-valued logic: one NULL in the list poisons NOT IN entirely
    assert r.null_poisoned
    assert r.not_in_count == 0
    non_null = {k for k in keys if k is not None}
    want_ne = sum(1 for p in probe if p not in non_null)
    assert r.not_exists_count == want_ne
    assert r.not_in_filtered_count == want_ne
    assert r.equivalent_after_filter


def test_normalized_key_join_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext178 import (
        q_normalized_key_join,
    )
    import re

    got = {
        r.source: (r.n_docs, r.raw_matches, r.norm_matches,
                   r.norm_match_rate)
        for r in q_normalized_key_join(spark, sf_dir).collect()
    }
    agg = {}
    for d in _docs(spark, sf_dir):
        raw = {
            0: d.source.upper(),
            1: "  " + d.source,
            2: d.source + "   ",
        }.get(d.doc_id % 7, d.source)
        norm = re.sub(" +", " ", raw).strip().lower()
        e = agg.setdefault(d.source, [0, 0, 0])
        e[0] += 1
        e[1] += raw == d.source
        e[2] += norm == d.source
    want = {
        s: (n, rm, nm, round(nm / n, 6)) for s, (n, rm, nm) in agg.items()
    }
    assert got == want
    # normalization recovers every key (sources are lowercase clean)
    assert all(v[3] == 1.0 for v in got.values())
    # and the raw rate really was broken
    assert all(v[1] < v[0] for v in got.values())
