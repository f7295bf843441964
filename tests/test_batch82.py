"""Batch-82 tests: Jaro-Winkler kernel, SCD Type-2 invariants, winnowing
fingerprint guarantee."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.textops import jaro_winkler_py


def test_jaro_winkler_reference_values():
    """Textbook pairs (Winkler 1990 literature values) plus the
    floor-transposition convention pinned against DuckDB."""
    assert abs(jaro_winkler_py("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(jaro_winkler_py("dixon", "dicksonx") - 0.8133333333333332) < 1e-12
    assert abs(jaro_winkler_py("duane", "dwayne") - 0.8400000000000001) < 1e-12
    assert jaro_winkler_py("abc", "abc") == 1.0
    assert jaro_winkler_py("", "abc") == 0.0
    assert jaro_winkler_py("", "") == 1.0
    # odd mismatched-match count: t = 3 // 2 = 1 (NOT 1.5) → 0.7222…,
    # no boost (prefix length 0)
    assert abs(jaro_winkler_py("raecan", "aer") - 0.7222222222222222) < 1e-12
    # boost applies only above jaro 0.7 (shared prefix, low jaro)
    assert jaro_winkler_py("abcdefgh", "abzzzzzz") == 0.5


def test_jaro_winkler_matches_duckdb_bits():
    """Cross-engine differential: the Python kernel must be BIT-equal to
    DuckDB's jaro_winkler_similarity (the oracle twin) on randomized
    word-salad pairs shaped like the documents table."""
    import random
    import struct

    import duckdb

    con = duckdb.connect()
    rng = random.Random(99)
    words = ["key", "agg", "row", "scan", "slow", "table", "value", "a", "the"]
    for _ in range(300):
        a = " ".join(rng.choices(words, k=rng.randint(1, 8)))[:24]
        b = " ".join(rng.choices(words, k=rng.randint(1, 8)))[:24]
        d = con.sql(
            "select jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert struct.pack(">d", d) == struct.pack(
            ">d", jaro_winkler_py(a, b)
        ), (a, b, d, jaro_winkler_py(a, b))


def test_scd2_invariants(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext87 import q_scd2_dim

    dim = q_scd2_dim(spark, sf_dir).cache()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # exactly one current row per customer
    cur = dim.filter("is_current").groupBy("custkey").count()
    assert cur.filter("count != 1").count() == 0
    # versions are contiguous 1..K per customer
    vr = dim.groupBy("custkey").agg(
        F.min("version").alias("lo"),
        F.max("version").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    assert vr.filter("lo != 1 OR hi != n").count() == 0
    # ranges ordered and non-overlapping: valid_to (when set) is the next
    # version's valid_from and >= valid_from
    bad = dim.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") < F.col("valid_from"))
    )
    assert bad.count() == 0
    # n_orders conservation
    tot = dim.agg(F.sum("n_orders")).first()[0]
    assert tot == orders.count()
    dim.unpersist()


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing property (Schleimer et al. §3): any shared word run
    of length >= k + w - 1 = 8 yields at least one shared fingerprint —
    even when the run sits at different positions in each doc."""
    from arrow_supercluster_spark.plans.registry_ext87 import (
        q_winnow_fingerprints,
    )
    import tempfile

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    docs = spark.createDataFrame(
        [
            (1, "x1 y1 z1 " + shared + " tail1 tail2 tail3 tail4"),
            (2, shared + " completely different suffix words here now"),
            (3, "no overlap with anything else at all in this one"),
        ],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        fp = q_winnow_fingerprints(spark, d).cache()
        f1 = {r.fp for r in fp.filter("doc_id = 1").collect()}
        f2 = {r.fp for r in fp.filter("doc_id = 2").collect()}
        f3 = {r.fp for r in fp.filter("doc_id = 3").collect()}
        assert f1 & f2, "8-word shared run must share a fingerprint"
        assert not (f1 & f3) and not (f2 & f3)
        # density sanity: fingerprints are a strict subset of the grams
        total_grams = sum(
            len(r.text.split()) - 3 for r in docs.collect()
        )
        assert fp.count() < total_grams
        fp.unpersist()
