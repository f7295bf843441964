"""Round-7 registry additions, batch 191 — query-time retrieval
operators (the ranking functions a search layer runs per query; BM25 /
TF-IDF / RRF / MMR already exist — these complete the LM-scoring and
positional families):

- q_query_likelihood: language-model retrieval scores for the stated
  query {spark, join, stream} — Dirichlet-prior smoothing (μ=50,
  Zhai & Lafferty 2001) and Jelinek-Mercer (λ=0.5) log-likelihoods per
  document, top-20 by Dirichlet score.  Term frequencies are
  expression-only list_filter counts — the corpus never explodes.
- q_best_passage: densest query-term window (width 8) per document —
  the passage-retrieval primitive behind snippet generation: hit
  positions from one posexplode, window score via a per-document
  bounded band self-join on positions, smallest-start tiebreak.
- q_term_proximity: MinDist proximity (Tao & Zhai 2007) — the minimum
  distance between occurrences of two DISTINCT query terms per
  document, with the pair that achieves it; documents ranked by
  proximity.

At 100 TB: q_query_likelihood is a single scan with per-row list
expressions plus one 1-row corpus-stats broadcast; the positional pair
stages join hit positions WITHIN a document only (hits per doc ≤ doc
length, and only query-term hits survive the filter), so the shuffle
carries hits, not tokens.  Scores are ln of ratios of exact integers;
outputs round to 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import (
    SQL_TOKS,
    _docs,
)

_QL_TERMS = ("spark", "join", "stream")
_QL_MU = 50.0
_QL_LAMBDA = 0.5
_QL_TOPK = 20
_BP_WIDTH = 8
_BP_TOPK = 20
_TP_TOPK = 20

_SQL_TERMS = ", ".join(repr(t) for t in _QL_TERMS)


def _spark_toks():
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return F.split(norm, " ")


def _eq_term(t):
    return lambda x: x == F.lit(t)


# ===========================================================================
# R569 — query-likelihood LM scoring (Dirichlet + Jelinek-Mercer)
# ===========================================================================

@register(
    "q_query_likelihood",
    f"""
    WITH base AS (
      SELECT doc_id, {SQL_TOKS} AS toks FROM documents
    ),
    tf AS (
      SELECT doc_id, len(toks) AS dl,
             {', '.join(
                 f"len(list_filter(toks, x -> x = {t!r})) AS tf{i}"
                 for i, t in enumerate(_QL_TERMS))}
      FROM base WHERE len(toks) > 0
    ),
    corpus AS (
      SELECT CAST(SUM(dl) AS BIGINT) AS total,
             {', '.join(
                 f'CAST(SUM(tf{i}) AS BIGINT) AS cf{i}'
                 for i in range(len(_QL_TERMS)))}
      FROM tf
    ),
    scored AS (
      SELECT doc_id, dl,
             {' + '.join(
                 f"ln((tf{i} + {_QL_MU} * cf{i} / total)"
                 f" / (dl + {_QL_MU}))"
                 for i in range(len(_QL_TERMS)))} AS dirichlet,
             {' + '.join(
                 f"ln((1.0 - {_QL_LAMBDA}) * tf{i} * 1.0 / dl"
                 f" + {_QL_LAMBDA} * cf{i} / total)"
                 for i in range(len(_QL_TERMS)))} AS jm
      FROM tf CROSS JOIN corpus
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS dl,
           round(dirichlet, 6) AS dirichlet_score,
           round(jm, 6) AS jm_score
    FROM scored
    ORDER BY dirichlet DESC, doc_id LIMIT {_QL_TOPK}
    """,
)
def q_query_likelihood(spark, sf_dir):
    """R569 — log P(Q|doc) under Dirichlet (tf+μp)/(dl+μ) and JM
    (1−λ)tf/dl + λp smoothing, p = corpus cf/total.  tf is an
    expression-only list_filter count (no explode); corpus stats are
    one broadcast row; top-20 is TakeOrdered.  JM ln hits −inf only
    if a term never occurs in the corpus (guarded by the stated
    query's presence in the fixture vocabulary)."""
    toks = _spark_toks()
    tf = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(toks).alias("dl"),
            *[
                F.size(
                    F.filter(toks, _eq_term(t))
                ).alias(f"tf{i}")
                for i, t in enumerate(_QL_TERMS)
            ],
        )
        .filter(F.col("dl") > 0)
    )
    corpus = tf.agg(
        F.sum("dl").alias("total"),
        *[
            F.sum(f"tf{i}").alias(f"cf{i}")
            for i in range(len(_QL_TERMS))
        ],
    )
    dirichlet = None
    jm = None
    for i in range(len(_QL_TERMS)):
        d_i = F.log(
            (
                F.col(f"tf{i}")
                + _QL_MU * F.col(f"cf{i}") / F.col("total")
            )
            / (F.col("dl") + _QL_MU)
        )
        j_i = F.log(
            (1.0 - _QL_LAMBDA) * F.col(f"tf{i}") * 1.0 / F.col("dl")
            + _QL_LAMBDA * F.col(f"cf{i}") / F.col("total")
        )
        dirichlet = d_i if dirichlet is None else dirichlet + d_i
        jm = j_i if jm is None else jm + j_i
    return (
        tf.crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "dl",
            dirichlet.alias("dirichlet"),
            jm.alias("jm"),
        )
        .orderBy(F.desc("dirichlet"), F.asc("doc_id"))
        .limit(_QL_TOPK)
        .select(
            "doc_id",
            "dl",
            F.round("dirichlet", 6).alias("dirichlet_score"),
            F.round("jm", 6).alias("jm_score"),
        )
    )


# ===========================================================================
# R570 — densest query-term passage (width-8 window)
# ===========================================================================

_SQL_HITS = f"""
      SELECT doc_id, i
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks))) AS i
        FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
      )
      WHERE toks[i] IN ({_SQL_TERMS})
"""


@register(
    "q_best_passage",
    f"""
    WITH hits AS ({_SQL_HITS}),
    wins AS (
      SELECT a.doc_id, a.i,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM hits a JOIN hits b
        ON b.doc_id = a.doc_id
       AND b.i >= a.i AND b.i < a.i + {_BP_WIDTH}
      GROUP BY 1, 2
    ),
    best AS (
      SELECT doc_id, MAX(cnt) AS mc,
             CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM (SELECT doc_id, i, MAX(cnt) AS cnt FROM wins GROUP BY 1, 2) w
      GROUP BY 1
    ),
    sel AS (
      SELECT w.doc_id, MIN(w.i) AS win_start, MAX(b.mc) AS win_hits,
             MAX(b.n_hits) AS n_hits
      FROM wins w JOIN best b
        ON b.doc_id = w.doc_id AND w.cnt = b.mc
      GROUP BY 1
    )
    SELECT doc_id, CAST(win_start AS BIGINT) AS win_start,
           win_hits, n_hits
    FROM sel
    ORDER BY win_hits DESC, doc_id LIMIT {_BP_TOPK}
    """,
)
def q_best_passage(spark, sf_dir):
    """R570 — per doc the width-8 token window holding the most query
    hits (windows anchored at hit positions — the optimum is always
    hit-anchored), smallest start on ties.  Hit positions come from
    one posexplode filtered to query terms; the band self-join is
    per-document and hit-bounded."""
    toks = _spark_toks()
    hits = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(toks).alias("i0", "tok"))
        .filter(F.col("tok").isin(*_QL_TERMS))
        .select("doc_id", (F.col("i0") + 1).alias("i"))
    )
    b = hits.select(
        F.col("doc_id").alias("bd"), F.col("i").alias("bi")
    )
    wins = (
        hits.join(
            b,
            (F.col("bd") == F.col("doc_id"))
            & (F.col("bi") >= F.col("i"))
            & (F.col("bi") < F.col("i") + _BP_WIDTH),
        )
        .groupBy("doc_id", "i")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    best = wins.groupBy("doc_id").agg(
        F.max("cnt").alias("mc"), F.count(F.lit(1)).alias("n_hits")
    )
    sel = (
        wins.join(
            best.select(
                F.col("doc_id").alias("bd2"),
                F.col("mc"),
                F.col("n_hits"),
            ),
            (F.col("bd2") == F.col("doc_id"))
            & (F.col("cnt") == F.col("mc")),
        )
        .groupBy("doc_id")
        .agg(
            F.min("i").alias("win_start"),
            F.max("mc").alias("win_hits"),
            F.max("n_hits").alias("n_hits"),
        )
    )
    return (
        sel.orderBy(F.desc("win_hits"), F.asc("doc_id"))
        .limit(_BP_TOPK)
        .select(
            "doc_id",
            F.col("win_start").cast("long").alias("win_start"),
            "win_hits",
            "n_hits",
        )
    )


# ===========================================================================
# R571 — MinDist term proximity
# ===========================================================================

_SQL_THITS = f"""
      SELECT doc_id, i, toks[i] AS term
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks))) AS i
        FROM (SELECT doc_id, {SQL_TOKS} AS toks FROM documents)
      )
      WHERE toks[i] IN ({_SQL_TERMS})
"""


@register(
    "q_term_proximity",
    f"""
    WITH hits AS ({_SQL_THITS}),
    pairs AS (
      SELECT a.doc_id,
             MIN(abs(a.i - b.i)) AS min_dist
      FROM hits a JOIN hits b
        ON b.doc_id = a.doc_id AND a.term < b.term
      GROUP BY 1
    )
    SELECT doc_id, CAST(min_dist AS BIGINT) AS min_dist
    FROM pairs
    ORDER BY min_dist, doc_id LIMIT {_TP_TOPK}
    """,
)
def q_term_proximity(spark, sf_dir):
    """R571 — MinDist: the smallest position gap between occurrences
    of two DIFFERENT query terms in a document (docs with fewer than
    two distinct query terms drop out of the pair join).  Per-document
    hit-bounded pair stage, TakeOrdered top-20."""
    toks = _spark_toks()
    hits = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(toks).alias("i0", "term"))
        .filter(F.col("term").isin(*_QL_TERMS))
        .select("doc_id", (F.col("i0") + 1).alias("i"), "term")
    )
    b = hits.select(
        F.col("doc_id").alias("bd"),
        F.col("i").alias("bi"),
        F.col("term").alias("bterm"),
    )
    return (
        hits.join(
            b,
            (F.col("bd") == F.col("doc_id"))
            & (F.col("term") < F.col("bterm")),
        )
        .groupBy("doc_id")
        .agg(F.min(F.abs(F.col("i") - F.col("bi"))).alias("min_dist"))
        .orderBy(F.asc("min_dist"), F.asc("doc_id"))
        .limit(_TP_TOPK)
        .select("doc_id", F.col("min_dist").cast("long").alias("min_dist"))
    )
