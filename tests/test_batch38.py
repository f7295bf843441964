"""Batch-38 tests: portable-sketch properties — estimator bias bound,
identity/perturbation behavior on constructed corpora."""

import pandas as pd
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def _mini_corpus(spark, tmp_path_factory, texts):
    d = str(tmp_path_factory.mktemp("mini_docs"))
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_minhash_estimator_bias_bound(spark, sf_dir):
    rows = REGISTRY["q_minhash_estimate"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.exact_jaccard <= 1.0
        assert 0.0 <= r.est_jaccard <= 1.0
    # E[est] = J (Broder); with 16 perms the mean abs error over ~500
    # pairs should sit well under one std of a single estimate (0.125)
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err < 0.2, mean_err


def test_minhash_identical_docs_identical_sigs(spark, tmp_path_factory):
    d = _mini_corpus(
        spark,
        tmp_path_factory,
        ["the quick brown fox jumps over the lazy dog"] * 2
        + ["a completely different text about spark engines and hashing"],
    )
    rows = {r.doc_id: r for r in REGISTRY["q_minhash_portable"].spark(spark, d).collect()}
    sig = lambda r: tuple(r[f"sig_{j}"] for j in range(16))
    assert sig(rows[0]) == sig(rows[1])
    assert sig(rows[0]) != sig(rows[2])


def test_simhash_perturbation_small_hamming(spark, tmp_path_factory):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    pert = base.replace("gamma", "gXmma", 1)
    d = _mini_corpus(spark, tmp_path_factory, [base, base, pert])
    rows = {r.doc_id: r.simhash for r in REGISTRY["q_simhash_portable"].spark(spark, d).collect()}
    assert rows[0] == rows[1]
    ham = bin(rows[0] ^ rows[2]).count("1")
    assert ham <= 6, ham


def test_portable_sigs_in_range(spark, sf_dir):
    rows = REGISTRY["q_minhash_portable"].spark(spark, sf_dir).limit(50).collect()
    for r in rows:
        for j in range(16):
            assert 0 <= r[f"sig_{j}"] < 2147483647
