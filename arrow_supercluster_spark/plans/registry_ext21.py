"""Round-2 registry additions, batch 16 — tokenizer training and
robust-statistics clipping:

- q_bpe_merges: three byte-pair-encoding merge iterations learned from
  the corpus (Sennrich et al. 2016) — the tokenizer-training kernel,
  driver-loop on the Spark side, fully unrolled CTEs on the oracle
  side (the PageRank differential pattern);
- q_winsorize: percentile winsorization of a skewed measure with a
  clipping audit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import bpe
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_table

_BPE_ITERS = 3

# DuckDB twins of bpe.py's kernels ------------------------------------------

_SQL_VOCAB = f"""
    vocab AS (
      SELECT word, COUNT(*) AS freq FROM (
        SELECT unnest({SQL_TOKS}) AS word FROM documents
      ) w GROUP BY 1
    ),
    s0 AS (
      SELECT ' ' || trim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' '
               AS seq, freq
      FROM vocab
    )
"""


def _sql_pairs(src: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT t[i] AS x, t[i+1] AS y, SUM(freq) AS cnt FROM (
        SELECT string_split(trim(seq), ' ') AS t, freq FROM {src}
      ) z, unnest(generate_series(1, len(t) - 1)) AS u(i)
      WHERE len(t) >= 2
      GROUP BY 1, 2
    )"""


def _sql_winner(pairs: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT x, y, cnt FROM {pairs} ORDER BY cnt DESC, x, y LIMIT 1
    )"""


def _sql_merge(src: str, winner: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT replace(seq,
                     ' ' || (SELECT x FROM {winner}) || ' '
                         || (SELECT y FROM {winner}) || ' ',
                     ' ' || (SELECT x FROM {winner})
                         || (SELECT y FROM {winner}) || ' ') AS seq,
             freq
      FROM {src}
    )"""


_BPE_SQL = (
    "WITH "
    + _SQL_VOCAB
    + ","
    + ",".join(
        _sql_pairs(f"s{i}", f"p{i}")
        + ","
        + _sql_winner(f"p{i}", f"w{i}")
        + ","
        + _sql_merge(f"s{i}", f"w{i}", f"s{i + 1}")
        for i in range(_BPE_ITERS)
    )
    + " "
    + " UNION ALL ".join(
        f"SELECT {i + 1} AS step, x, y, cnt FROM w{i}"
        for i in range(_BPE_ITERS)
    )
)


@register("q_bpe_merges", _BPE_SQL)
def q_bpe_merges(spark, sf_dir):
    """Pipeline — BPE tokenizer training, first {n} merge rules learned
    from the corpus: (step, x, y, cnt). The corpus collapses once to
    the (word, freq) vocabulary; every iteration after runs on
    vocabulary-sized data (independent of corpus size), with a 1-row
    winner collect per iteration (k-means-seed-scale driver state) and
    localCheckpoint keeping the loop's lineage flat. The oracle unrolls
    the same three iterations as chained CTEs — pair counting, winner
    selection (count desc, pair asc), and the greedy left-to-right
    collapse are each differentially checked through all three rounds."""
    merges, _ = bpe.learn_merges(_docs(spark, sf_dir), n_merges=_BPE_ITERS)
    rows = [
        (i + 1, x, y, int(cnt)) for i, (x, y, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(rows, "step int, x string, y string, cnt bigint")


# ===========================================================================
# Percentile winsorization
# ===========================================================================

_WINS_LO = 0.05
_WINS_HI = 0.95


@register(
    "q_winsorize",
    f"""
    WITH cuts AS (
      SELECT l_returnflag AS rf,
             quantile_cont(l_extendedprice, {_WINS_LO}) AS lo,
             quantile_cont(l_extendedprice, {_WINS_HI}) AS hi
      FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS n_lo,
           SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS n_hi,
           round(AVG(l_extendedprice), 4) AS mean_raw,
           round(AVG(greatest(least(l_extendedprice, hi), lo)), 4)
             AS mean_wins
    FROM lineitem l JOIN cuts ON cuts.rf = l.l_returnflag
    GROUP BY 1
    """,
)
def q_winsorize(spark, sf_dir):
    """Robust statistics — per-group percentile winsorization (clip the
    measure into [p05, p95] of its own group) with a clipping audit:
    how many rows hit each bound and the mean before/after. The cuts
    table is |groups| rows broadcast back; the clip is a narrow
    greatest/least map — one stats agg + one narrow pass. Exact
    percentiles interpolate identically in both engines (percentile ==
    quantile_cont)."""
    li = read_table(spark, sf_dir, "lineitem")
    cuts = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.expr(f"percentile(l_extendedprice, {_WINS_LO})").alias("lo"),
        F.expr(f"percentile(l_extendedprice, {_WINS_HI})").alias("hi"),
    )
    j = li.join(
        F.broadcast(cuts), li["l_returnflag"] == cuts["rf"]
    )
    clipped = F.greatest(F.least(F.col("l_extendedprice"), F.col("hi")), F.col("lo"))
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_extendedprice") < F.col("lo")).cast("long")).alias("n_lo"),
        F.sum((F.col("l_extendedprice") > F.col("hi")).cast("long")).alias("n_hi"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean_raw"),
        F.round(F.avg(clipped), 4).alias("mean_wins"),
    )
