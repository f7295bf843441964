"""Batch-44 tests: lexical diversity vs Counter math, SRM chi2, table
profile spot checks."""

from collections import Counter

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events, read_table


def test_lexical_diversity_math(spark, sf_dir):
    from arrow_supercluster_spark.operators.dedup import normalize_text

    norm = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", normalize_text(F.col("text")).alias("n"))
        .collect()
    }
    rows = REGISTRY["q_lexical_diversity"].spark(spark, sf_dir).collect()
    for r in rows[:300]:
        toks = [t for t in norm[r.doc_id].split(" ") if t]
        cnt = Counter(toks)
        assert r.n_tokens == len(toks)
        assert r.n_types == len(cnt)
        if toks:
            assert abs(r.ttr - len(cnt) / len(toks)) < 1.01e-6
            hapax = sum(1 for c in cnt.values() if c == 1)
            assert abs(r.hapax_frac - hapax / len(cnt)) < 1.01e-6


def test_srm_math(spark, sf_dir):
    users = {r.user_id for r in read_events(spark, sf_dir).select("user_id").distinct().collect()}
    n0 = sum(1 for u in users if u % 2 == 0)
    n1 = len(users) - n0
    exp = (n0 + n1) / 2
    chi2 = (n0 - exp) ** 2 / exp + (n1 - exp) ** 2 / exp
    row = REGISTRY["q_srm_check"].spark(spark, sf_dir).collect()[0]
    assert (row.n0, row.n1) == (n0, n1)
    assert abs(row.chi2 - chi2) < 1.01e-6
    assert row.srm_detected == int(chi2 > 3.841)


def test_table_profile_spot_checks(spark, sf_dir):
    rows = {(r.tbl, r.col): r for r in REGISTRY["q_table_profile"].spark(spark, sf_dir).collect()}
    assert len(rows) == 15
    cust = read_table(spark, sf_dir, "customer")
    r = rows[("customer", "c_custkey")]
    assert r.n_rows == cust.count()
    assert r.null_frac == 0.0
    assert r.n_distinct == cust.count()  # primary key
    ev = rows[("events", "value")]
    assert 0.0 <= ev.null_frac < 1.0
