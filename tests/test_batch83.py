"""Batch-83 tests: TF cosine, phrase search, sequence likelihood."""

import tempfile

from pyspark.sql import functions as F


def _write_docs(spark, d, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )


def test_tf_cosine_identity_disjoint_and_hand_case(spark):
    from arrow_supercluster_spark.plans.registry_ext88 import (
        q_tf_cosine_adjacent,
    )

    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            d,
            [
                (1, "a b a"),            # tf: a2 b1
                (2, "a b a"),            # identical → cos 1
                (3, "c d e"),            # disjoint from doc 2 → 0
                (4, "a a b b"),          # vs doc3: disjoint → 0
            ],
        )
        got = {
            (r.a_id, r.b_id): r.tf_cos
            for r in q_tf_cosine_adjacent(spark, d).collect()
        }
        assert got[(1, 2)] == 1.0
        assert got[(2, 3)] == 0.0
        assert got[(3, 4)] == 0.0
        assert len(got) == 3


def test_tf_cosine_partial_overlap(spark):
    from arrow_supercluster_spark.plans.registry_ext88 import (
        q_tf_cosine_adjacent,
    )

    with tempfile.TemporaryDirectory() as d:
        # doc1 tf {a:1, b:1}, doc2 tf {a:1, c:1}: dot=1, norms sqrt(2)
        # → cos = 0.5
        _write_docs(spark, d, [(1, "a b"), (2, "a c")])
        [r] = q_tf_cosine_adjacent(spark, d).collect()
        assert r.tf_cos == 0.5


def test_phrase_search_counts_and_positions(spark):
    from arrow_supercluster_spark.plans.registry_ext88 import q_phrase_search

    with tempfile.TemporaryDirectory() as d:
        _write_docs(
            spark,
            d,
            [
                (1, "table value x table value"),   # 2 hits, first at 1
                (2, "value table x y"),             # reversed → no hit
                (3, "x table value y"),             # 1 hit at pos 2
                (4, "table x value"),               # not adjacent → none
            ],
        )
        got = {
            r.doc_id: (r.n_hits, r.first_pos)
            for r in q_phrase_search(spark, d).collect()
        }
        assert got == {1: (2, 1), 3: (1, 2)}


def test_sequence_likelihood_properties(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext88 import (
        q_sequence_likelihood,
    )

    ll = q_sequence_likelihood(spark, sf_dir).cache()
    # log-probabilities: avg_ll <= 0 always; users with one event have no
    # transitions and are absent
    assert ll.filter(F.col("avg_ll") > 0).count() == 0
    assert ll.filter(F.col("n_trans") < 1).count() == 0
    # conservation: total transitions = total events - users-with-events
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert ll.agg(F.sum("n_trans")).first()[0] == n_events - n_users
    ll.unpersist()
