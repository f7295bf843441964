"""Batch-97 tests: LSA vs numpy SVD, temporal-split leakage, IPF
marginal convergence."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import tempfile

import numpy as np

from pyspark.sql import functions as F


def test_lsa_rank1_matches_numpy_svd(spark, sf_dir):
    from arrow_supercluster_spark.operators.dedup import tokenize
    from arrow_supercluster_spark.plans.registry_ext102 import q_lsa_rank1

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tf = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .collect()
    )
    n_docs = docs.count()
    dfreq = {}
    for r in tf:
        dfreq[r.tok] = dfreq.get(r.tok, 0) + 1
    toks = sorted(dfreq)
    dids = sorted({r.doc_id for r in tf})
    ti = {t: i for i, t in enumerate(toks)}
    di = {d: i for i, d in enumerate(dids)}
    M = np.zeros((len(dids), len(toks)))
    for r in tf:
        M[di[r.doc_id], ti[r.tok]] = r["count"] * np.log(
            n_docs / dfreq[r.tok]
        )
    _, s, vt = np.linalg.svd(M, full_matrices=False)
    v_ref = vt[0]
    got = {r.tok: (r.loading, r.sigma) for r in q_lsa_rank1(spark, sf_dir).collect()}
    sigma = next(iter(got.values()))[1]
    assert abs(sigma - s[0]) < 1e-2 * s[0]
    # loadings equal up to global sign
    v_got = np.array([got[t][0] for t in toks])
    v_ref = v_ref if v_ref @ v_got > 0 else -v_ref
    assert np.max(np.abs(v_got - v_ref)) < 1e-4


def test_temporal_split_leakage_hand_case(spark):
    from arrow_supercluster_spark.plans.registry_ext102 import (
        q_temporal_split,
    )

    rows = [
        # user 1 only early, user 2 both sides, user 3 only late
        (1, 1, "a", 1.0, "2024-01-01 00:00:00"),
        (2, 2, "a", 1.0, "2024-01-02 00:00:00"),
        (3, 2, "a", 1.0, "2024-01-10 00:00:00"),
        (4, 3, "a", 1.0, "2024-01-10 00:00:00"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, value double, t string"
        ).select(
            "event_id", F.to_timestamp("t").alias("ts"), "user_id",
            "event_type", "value", F.lit("{}").alias("props"),
        ).write.parquet(f"{d}/events.parquet")
        got = {r.split: r for r in q_temporal_split(spark, d).collect()}
        # cut at 80% of [Jan1, Jan10] = Jan 8.2 → events 1,2 train; 3,4 test
        assert (got["train"].n_events, got["train"].n_users) == (2, 2)
        assert (got["test"].n_events, got["test"].n_users) == (2, 2)
        assert got["train"].n_leaking_users == 1   # user 2


def test_ipf_marginals_converge_to_uniform(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext102 import q_ipf_raking

    rows = q_ipf_raking(spark, sf_dir).collect()
    assert all(r.weight > 0 for r in rows)
    total = sum(r.n_docs for r in rows)
    sources = {r.source for r in rows}
    langs = {r.lang for r in rows}
    t_row = total / len(sources)
    t_col = total / len(langs)
    by_s = {}
    by_l = {}
    for r in rows:
        by_s[r.source] = by_s.get(r.source, 0.0) + r.weight * r.n_docs
        by_l[r.lang] = by_l.get(r.lang, 0.0) + r.weight * r.n_docs
    # after the final column pass, column marginals are exact and row
    # marginals are within Sinkhorn convergence tolerance
    for l, v in by_l.items():
        assert abs(v - t_col) < 1e-6 * t_col, l
    for s, v in by_s.items():
        assert abs(v - t_row) < 0.02 * t_row, s
