"""Similarity-search quality tests: ANN variants must actually approximate
the exact baseline (recall), not just run."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import similarity


def _sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.vec_id)
    return out


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    exact = _sets(similarity.cosine_topk(corpus, queries, k=5))
    approx = _sets(
        similarity.ivf_topk(corpus, queries, k=5, n_lists=8, nprobe=4)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"IVF recall {hits}/{total}"


def test_lsh_candidates_within_bucket_are_exact(spark, sf_dir):
    """LSH-returned cosines must equal the brute-force cosines for the
    same (q, target) pairs — bucketing prunes, it must not perturb."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    exact = {
        (r.q_id, r.vec_id): r.cos
        for r in similarity.cosine_topk(corpus, queries, k=1000).collect()
    }
    for r in similarity.cosine_topk_lsh(corpus, queries, k=5).collect():
        assert abs(exact[(r.q_id, r.vec_id)] - r.cos) < 1e-9
