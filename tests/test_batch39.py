"""Batch-39 tests: novelty boundary conditions, Heaps curve shape,
stylometry symmetry/self-zero."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY


def test_novelty_first_doc_is_all_novel(spark, sf_dir):
    rows = {r.doc_id: r for r in REGISTRY["q_ngram_novelty"].spark(spark, sf_dir).collect()}
    first = min(rows)
    assert rows[first].novelty == 1.0  # nothing precedes the first doc
    for r in rows.values():
        assert 0.0 <= r.novelty <= 1.0
        assert 0 <= r.n_novel <= r.n_grams
    # total novel grams == global distinct gram count
    total_novel = sum(r.n_novel for r in rows.values())
    from arrow_supercluster_spark.operators.dedup import shingles, tokenize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    distinct_grams = (
        docs.select(
            F.explode(
                F.array_distinct(
                    F.filter(shingles(tokenize(F.col("text"))), lambda s: s != F.lit(""))
                )
            ).alias("g")
        )
        .select("g")
        .distinct()
        .count()
    )
    assert total_novel == distinct_grams


def test_heaps_curve_monotone_concave_ish(spark, sf_dir):
    rows = sorted(REGISTRY["q_heaps_law"].spark(spark, sf_dir).collect(), key=lambda r: r.decile)
    assert rows[0].decile == 1
    sizes = [r.vocab_size for r in rows]
    assert all(b >= a for a, b in zip(sizes, sizes[1:]))
    # first decile introduces the most new types (templated corpus or not)
    news = [r.new_types for r in rows]
    assert news[0] == max(news)
    assert sum(news) == sizes[-1]


def test_stylometry_properties(spark, sf_dir):
    rows = REGISTRY["q_stylometry_delta"].spark(spark, sf_dir).collect()
    n_src = spark.read.parquet(f"{sf_dir}/documents.parquet").select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert r.delta >= 0.0
