"""Byte-pair-encoding merge learning (Sennrich et al. 2016, public
algorithm) — the tokenizer-training kernel of an LLM data pipeline,
restated relationally.

One merge iteration over a (word, freq) vocabulary:
1. each word is a space-joined symbol sequence (initially characters);
2. adjacent-pair counts, weighted by word frequency — an in-row zip of
   the symbol array with its own shift (the PMI/bigram trick, no
   per-symbol explode of the corpus) followed by ONE pair-keyed agg;
3. the winning pair (count desc, pair asc — deterministic) collapses:
   ' x y ' -> ' xy ' via plain left-to-right non-overlapping string
   replace on the delimited sequence, which is exactly BPE's greedy
   left-to-right merge semantics (both Spark's replace() and the
   oracle's behave identically, including the ' a a a ' -> ' aa a '
   overlap case).

Scale shape (100 TB of text): the corpus collapses ONCE to the
(word, freq) vocabulary — everything after runs on vocabulary-sized
data (|vocab| ~ 10^6 rows regardless of corpus size). The per-iteration
winner is a 1-row collect (the same driver-state scale as k-means
seeds); the merge itself is a narrow map over the vocabulary. The
driver loop over iterations mirrors the k-means/PageRank pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from arrow_supercluster_spark.operators.dedup import tokenize


def word_freqs(docs: DataFrame, text: str = "text") -> DataFrame:
    """(word, freq) vocabulary — the corpus's only full pass."""
    return (
        docs.select(F.explode(tokenize(F.col(text))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def to_symbol_seq(vocab: DataFrame) -> DataFrame:
    """(seq, freq): ' c h a r s ' — character symbols, space-delimited,
    with leading/trailing spaces so every pair ' x y ' is bounded."""
    chars = F.regexp_replace(F.col("word"), "(.)", "$1 ")
    return vocab.select(
        F.concat(F.lit(" "), F.trim(chars), F.lit(" ")).alias("seq"),
        "freq",
    )


def pair_counts(seqs: DataFrame) -> DataFrame:
    """(x, y, cnt) — adjacent symbol-pair counts weighted by freq."""
    toks = F.split(F.trim(F.col("seq")), " ")
    pairs = seqs.select(
        "freq",
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("x"),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("y"),
            )
        ).alias("p"),
    ).select("freq", F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    return pairs.groupBy("x", "y").agg(F.sum("freq").alias("cnt"))


def top_pair(seqs: DataFrame) -> tuple[str, str, int]:
    """The next merge rule: highest count, ties to the lexicographically
    smallest (x, y)."""
    row = (
        pair_counts(seqs)
        .orderBy(F.col("cnt").desc(), "x", "y")
        .limit(1)
        .collect()[0]
    )
    return row.x, row.y, row.cnt


def apply_merge(seqs: DataFrame, x: str, y: str) -> DataFrame:
    """Collapse every ' x y ' to ' xy ' (greedy left-to-right)."""
    return seqs.withColumn(
        "seq", F.replace(F.col("seq"), F.lit(f" {x} {y} "), F.lit(f" {x}{y} "))
    )


def learn_merges(docs: DataFrame, n_merges: int = 3, text: str = "text"):
    """Run `n_merges` BPE iterations; returns (merges, final_seqs) where
    merges is the ordered [(x, y, count)] rule list."""
    seqs = to_symbol_seq(word_freqs(docs, text))
    merges = []
    for _ in range(n_merges):
        x, y, cnt = top_pair(seqs)
        merges.append((x, y, cnt))
        seqs = apply_merge(seqs, x, y)
        # vocabulary-sized table; localCheckpoint keeps the lineage flat
        # across iterations (same discipline as the zoom/PageRank loops)
        seqs = seqs.localCheckpoint(eager=False)
    return merges, seqs
