"""Batch-13 operator tests: duplicate-span detection on constructed
fixtures, triangle counting on a known graph, bigram-LM edge cases."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import pandas as pd
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.decontam import dup_spans
from arrow_supercluster_spark.operators.graph import triangle_counts
from arrow_supercluster_spark.operators.relevance import bigram_logprob


def _docs_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_dup_spans_finds_known_overlap(spark):
    """Two docs share exactly one run of 10 consecutive tokens (3
    consecutive 8-grams) embedded in otherwise-distinct text."""
    shared = " ".join(f"s{i}" for i in range(10))
    a = "a0 a1 a2 a3 a4 a5 a6 a7 " + shared + " a8 a9 a10 a11 a12 a13 a14"
    b = "b0 b1 b2 b3 b4 b5 " + shared + " b6 b7 b8 b9 b10 b11 b12 b13"
    out = dup_spans(
        _docs_df(spark, [(1, a), (2, b)]), n=8, max_df=20, min_run=2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a_id, r.b_id) == (1, 2)
    # 3 consecutive 8-grams -> span of 3 + 7 = 10 tokens
    assert r.max_span_tokens == 10


def test_dup_spans_identical_docs_full_span(spark):
    text = " ".join(f"w{i}" for i in range(20))
    out = dup_spans(
        _docs_df(spark, [(1, text), (2, text)]), n=8, max_df=20, min_run=2
    ).collect()
    assert len(out) == 1
    assert out[0].max_span_tokens == 20  # whole doc duplicated


def test_dup_spans_below_min_run_excluded(spark):
    """A single shared 8-gram (run of 1) must not appear at min_run=2."""
    shared = " ".join(f"s{i}" for i in range(8))
    a = "a0 a1 a2 a3 " + shared + " a4 a5 a6 a7 a8 a9 a10 a11"
    b = "b0 b1 b2 b3 " + shared + " b4 b5 b6 b7 b8 b9 b10 b11"
    out = dup_spans(
        _docs_df(spark, [(1, a), (2, b)]), n=8, max_df=20, min_run=2
    ).collect()
    assert out == []


def test_dup_spans_df_cap_drops_boilerplate(spark):
    """A gram present in more docs than max_df is excluded entirely."""
    shared = " ".join(f"s{i}" for i in range(9))  # 2 consecutive 8-grams
    rows = [(i, f"p{i} q{i} r{i} t{i} " + shared) for i in range(5)]
    # df of the shared grams = 5 > max_df=4 -> no pairs at all
    assert (
        dup_spans(_docs_df(spark, rows), n=8, max_df=4, min_run=2).collect()
        == []
    )
    # with the cap above df, all 10 pairs appear
    assert (
        dup_spans(_docs_df(spark, rows), n=8, max_df=5, min_run=2).count()
        == 10
    )


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: nodes {1,2,3,4}, edges 12 13 14 23 24 (no 34).
    Triangles: (1,2,3) and (1,2,4). Counts: 1->2, 2->2, 3->1, 4->1."""
    edges = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], columns=["src", "dst"]
        )
    )
    got = {r.node: r.n_tri for r in triangle_counts(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_direction_and_dups_ignored(spark):
    """Reversed/duplicate directed edges collapse to one undirected edge."""
    edges = spark.createDataFrame(
        pd.DataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (1, 1)],
            columns=["src", "dst"],
        )
    )
    got = {r.node: r.n_tri for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_bigram_lm_short_docs_excluded(spark):
    out = bigram_logprob(
        _docs_df(spark, [(1, "one"), (2, "two words here")])
    ).collect()
    assert [r.doc_id for r in out] == [2]
    assert out[0].n_bigrams == 2


def test_bigram_lm_repetitive_beats_salad(spark):
    """A document whose transitions repeat corpus-frequent bigrams must
    score higher than one with never-seen transitions over the same
    vocabulary."""
    corpus = [(i, "the cat sat on the mat") for i in range(5)]
    corpus.append((100, "mat the on sat cat the"))  # reversed transitions
    out = {r.doc_id: r.avg_logprob for r in bigram_logprob(
        _docs_df(spark, corpus)
    ).collect()}
    assert out[0] > out[100]
