"""Batch-64 tests: Chao1 and missing-mass reference math."""

from collections import Counter

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.operators.dedup import normalize_text


def _counts(spark, sf_dir):
    cnt = Counter()
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        normalize_text(F.col("text")).alias("n")
    ).collect():
        for t in r.n.split(" "):
            if t:
                cnt[t] += 1
    return cnt


def test_chao1_reference(spark, sf_dir):
    cnt = _counts(spark, sf_dir)
    f1 = sum(1 for c in cnt.values() if c == 1)
    f2 = sum(1 for c in cnt.values() if c == 2)
    v = len(cnt)
    chao1 = v + (f1 * f1 / (2 * f2) if f2 > 0 else f1 * (f1 - 1) / 2)
    row = REGISTRY["q_chao1_vocab"].spark(spark, sf_dir).collect()[0]
    assert (row.v_obs, row.f1, row.f2) == (v, f1, f2)
    assert abs(row.chao1 - chao1) < 1.01e-6
    assert row.chao1 >= row.v_obs  # estimate never below observed


def test_missing_mass_reference(spark, sf_dir):
    cnt = _counts(spark, sf_dir)
    n = sum(cnt.values())
    f1 = sum(1 for c in cnt.values() if c == 1)
    row = REGISTRY["q_missing_mass"].spark(spark, sf_dir).collect()[0]
    assert (row.n_tokens, row.f1) == (n, f1)
    assert abs(row.missing_mass - f1 / n) < 1.01e-6
    assert 0.0 <= row.missing_mass <= 1.0
    assert abs(row.missing_mass + row.coverage - 1.0) < 2e-6
