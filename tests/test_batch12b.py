"""Batch-12 operator tests: relational Bloom filter (no false
negatives, candidate reduction, exact composition), SemDeDup semantic
dedup (independent numpy oracle), and the stream-stream interval join
(streaming pair set ≡ batch pair set)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import bloomfilter, centroids
from arrow_supercluster_spark.operators.decontam import (
    decontaminate,
    doc_ngram_digests,
)
from arrow_supercluster_spark.sources.tables import read_events


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

def test_bloom_bitmap_bounded(spark, sf_dir):
    grams = doc_ngram_digests(_docs(spark, sf_dir), 8).select("g").distinct()
    m = 1 << 12
    bloom = bloomfilter.bloom_build(grams, "g", m_bits=m, k=4)
    assert bloom.count() <= m // 64


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every gram actually in the eval set must survive the prefilter —
    even with a deliberately tiny (high-FPR) bitmap."""
    grams = doc_ngram_digests(_docs(spark, sf_dir), 8)
    eval_g = grams.filter(F.col("doc_id") % 29 == 0).select("g").distinct()
    m, k = 1 << 10, 3  # tiny on purpose: high FPR, zero FNR expected
    bloom = bloomfilter.bloom_build(eval_g, "g", m_bits=m, k=k)
    survivors = {
        r.g
        for r in bloomfilter.bloom_prefilter(
            eval_g, "g", bloom, m_bits=m, k=k
        ).collect()
    }
    truth = {r.g for r in eval_g.collect()}
    assert truth == survivors  # self-probe: every member passes


def test_bloom_prefilter_reduces_candidates(spark, sf_dir):
    """With a well-sized bitmap the prefilter must reject most
    non-members (FPR far below 1), while keeping all true members."""
    grams = doc_ngram_digests(_docs(spark, sf_dir), 8)
    eval_g = grams.filter(F.col("doc_id") % 29 == 0).select("g").distinct()
    train_g = grams.filter(F.col("doc_id") % 29 != 0)
    m, k = 1 << 17, 4
    bloom = bloomfilter.bloom_build(eval_g, "g", m_bits=m, k=k)
    candidates = bloomfilter.bloom_prefilter(train_g, "g", bloom, m_bits=m, k=k)
    n_candidates = candidates.count()
    n_train = train_g.count()
    n_true = train_g.join(eval_g, "g", "leftsemi").count()
    # all true matches survive...
    assert (
        candidates.join(eval_g, "g", "leftsemi").count() == n_true
    )
    # ...and the pass-through rate is dominated by true matches, not FPs
    assert n_candidates < n_true + 0.05 * n_train


def test_bloom_decontaminate_equals_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pred = F.col("doc_id") % 29 == 0
    got = {
        r.doc_id
        for r in bloomfilter.bloom_decontaminate(docs, pred, n=8).collect()
    }
    dirty = {r.doc_id for r in decontaminate(docs, pred, n=8).collect()}
    all_train = {
        r.doc_id for r in docs.filter(~pred).select("doc_id").collect()
    }
    assert got == all_train - dirty


# ---------------------------------------------------------------------------
# SemDeDup semantic dedup — independent numpy oracle
# ---------------------------------------------------------------------------

def test_semantic_dedup_matches_numpy_oracle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    k, tau = 8, 0.9
    got = {
        (r.vec_id, r.cid)
        for r in centroids.semantic_dedup(emb, k=k, tau=tau).collect()
    }

    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows])
    V = np.array([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    seeds = V[:k]
    d2 = np.round(((V[:, None, :] - seeds[None, :, :]) ** 2).sum(-1), 6)
    cid = d2.argmin(axis=1)  # argmin ties -> lowest index, same rule
    norms = np.linalg.norm(V, axis=1)
    want = set()
    for i in range(len(ids)):
        same = np.where((cid == cid[i]) & (ids < ids[i]))[0]
        dropped = False
        for j in same:
            denom = norms[i] * norms[j]
            cos = 0.0 if denom == 0 else float(V[i] @ V[j] / denom)
            if round(cos, 6) >= tau:
                dropped = True
                break
        if not dropped:
            want.add((int(ids[i]), int(cid[i])))
    assert got == want


def test_semantic_dedup_partition_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = {
        tuple(r)
        for r in centroids.semantic_dedup(emb.repartition(1), k=8).collect()
    }
    b = {
        tuple(r)
        for r in centroids.semantic_dedup(emb.repartition(7), k=8).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# Stream-stream interval join ≡ batch pair join
# ---------------------------------------------------------------------------

def test_stream_stream_attribution_matches_batch(
    spark, sf_dir, tmp_path_factory
):
    from arrow_supercluster_spark.streaming.joins import attribution_pairs

    src = str(tmp_path_factory.mktemp("events_join_src"))
    ev = read_events(spark, sf_dir)
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)

    q = (
        attribution_pairs(stream)
        .writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select purchase_id, user_id, view_id from attr_pairs"
    ).toPandas()

    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("v_us"),
    )
    want = (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user"))
            & (F.col("v_us") <= F.col("p_us"))
            & (F.col("v_us") >= F.col("p_us") - F.lit(24 * 3600 * 1_000_000)),
        )
        .select("purchase_id", "user_id", "view_id")
        .toPandas()
    )
    key = ["purchase_id", "user_id", "view_id"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w)
    assert len(g) > 0
