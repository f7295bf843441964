"""BPE merge-learning tests against hand-computed expectations."""

import pandas as pd
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import bpe


def _docs_df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_bpe_first_merge_hand_computed(spark):
    """Corpus 'ab ab ab ac': pairs (a,b)x3, (a,c)x1 -> first merge (a,b)."""
    docs = _docs_df(spark, ["ab ab ab ac"])
    merges, seqs = bpe.learn_merges(docs, n_merges=1)
    assert merges == [("a", "b", 3)]
    got = {r.seq: r.freq for r in seqs.collect()}
    assert got == {" ab ": 3, " a c ": 1}


def test_bpe_overlap_greedy_left_to_right(spark):
    """'aaa' with merge (a,a): greedy left-to-right gives [aa, a]."""
    docs = _docs_df(spark, ["aaa"])
    merges, seqs = bpe.learn_merges(docs, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    assert [r.seq for r in seqs.collect()] == [" aa a "]


def test_bpe_multi_iteration_builds_on_merged_symbols(spark):
    """'abc' x4: merges chain (a,b) then (ab,c) — later iterations must
    see the merged symbol as one unit."""
    docs = _docs_df(spark, ["abc abc abc abc"])
    merges, seqs = bpe.learn_merges(docs, n_merges=2)
    assert merges[0][:2] == ("a", "b")
    assert merges[1][:2] == ("ab", "c")
    assert [r.seq for r in seqs.collect()] == [" abc "]


def test_bpe_tie_breaks_lexicographic(spark):
    """'xy' and 'ab' each once: counts tie at 1 -> (a,b) wins (pair asc)."""
    docs = _docs_df(spark, ["xy ab"])
    merges, _ = bpe.learn_merges(docs, n_merges=1)
    assert merges[0][:2] == ("a", "b")


def test_bpe_vocab_not_corpus_sized(spark):
    """Repeating the corpus 10x must not change the learned rules'
    (x, y) — only counts scale (the kernel runs on the vocabulary)."""
    base = ["the cat sat on the mat", "the bat"]
    m1, _ = bpe.learn_merges(_docs_df(spark, base), n_merges=3)
    m10, _ = bpe.learn_merges(_docs_df(spark, base * 10), n_merges=3)
    assert [(x, y) for x, y, _ in m1] == [(x, y) for x, y, _ in m10]
    assert all(c10 == 10 * c1 for (_, _, c1), (_, _, c10) in zip(m1, m10))
