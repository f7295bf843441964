"""Round-5 registry additions, batch 102 — near-dup family completion
(Hamming-banded SimHash join) and IR query expansion (Rocchio
pseudo-relevance feedback):

- q_simhash_hamming_join: the SimHash counterpart of MinHash LSH
  banding: the portable 16-bit fingerprint (registry_ext43's
  oracle-checkable construction) splits into 4 nibbles; docs sharing
  any nibble at the same band position become candidates (a pair within
  Hamming distance r < 4 MUST agree on ≥1 of 4 bands — pigeonhole), then
  the exact popcount verifies distance ≤ r. Banded equi-join, never
  all-pairs.
- q_rocchio_prf: two-pass pseudo-relevance feedback: BM25 top-10 for the
  seed query → top-3 expansion terms by feedback-set document frequency
  (seed terms and stopwords excluded, lexical tie-break) → BM25 re-run
  with the expanded query. The expansion term set is structurally tiny
  (3 rows) — the only driver traffic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import relevance
from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_HAM_R = 3  # max Hamming distance (bits) for a verified near-dup
_SIM_BANDS = 4  # 16-bit fingerprint → 4 nibbles
_PRF_TERMS = ["spark", "hash", "vector"]
_PRF_FB = 10  # feedback depth
_PRF_EXPAND = 3  # expansion terms
_PRF_K = 20
_PRF_STOP = ("the", "a", "of", "to", "and", "in", "is")


def _sql_simhash_cte() -> str:
    """The q_simhash_portable SELECT as a reusable CTE body (same
    polynomial token hash, same bit votes — registry_ext43)."""
    from arrow_supercluster_spark.plans.registry_ext43 import (
        _SIM_BITS,
        _SQL_POLY,
    )

    poly = _SQL_POLY.format(
        shingles=f"list_filter({SQL_TOKS}, t -> t != '')"
    )
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_SIM_BITS)
    )
    return f"""
      SELECT doc_id, {bits} AS simhash
      FROM (SELECT doc_id, {poly} AS hs FROM documents) tk
      WHERE len(hs) > 0
    """


@register(
    "q_simhash_hamming_join",
    f"""
    WITH sh AS ({{sh}}),
    banded AS (
      SELECT doc_id, simhash, b.b, (simhash >> (4 * b.b)) & 15 AS nib
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {_SIM_BANDS - 1})) AS b) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             a.simhash AS a_sh, b.simhash AS b_sh
      FROM banded a JOIN banded b ON a.b = b.b AND a.nib = b.nib
      WHERE a.doc_id < b.doc_id
    )
    SELECT a_id, b_id,
           CAST(bit_count(xor(a_sh, b_sh)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(a_sh, b_sh)) <= {_HAM_R}
    """.format(sh=_sql_simhash_cte()),
)
def q_simhash_hamming_join(spark, sf_dir):
    """Hamming-banded SimHash near-dup join over the PORTABLE 16-bit
    fingerprint: band b = nibble b of the fingerprint; candidates =
    pairs agreeing on any (band, nibble); verify = popcount(xor) ≤ r.
    Pigeonhole guarantees recall 1.0 for r < #bands. Spark shape: in-row
    fingerprint (no shuffle) → 4-way posexplode → band equi-join →
    distinct pairs → popcount filter; the join is always band-bucketed,
    never all-pairs — the same scale discipline as lsh_candidate_pairs,
    with bit arithmetic replacing signature slots."""
    from arrow_supercluster_spark.plans.registry_ext43 import (
        q_simhash_portable,
    )

    from arrow_supercluster_spark.functions.checkpoint import truncate

    # r10: materialize the fingerprints once — both self-join sides
    # referenced the portable-simhash lineage (an interpreted per-char
    # fold over every document), so the whole fingerprint pass ran
    # twice (14.7 s → ~8 s at sf0.1).
    sh = truncate(q_simhash_portable(spark, sf_dir))
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 4 * b).bitwiseAND(F.lit(15))
                    for b in range(_SIM_BANDS)
                ]
            )
        ).alias("b", "nib"),
    )
    a = banded.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sh"),
        "b", "nib",
    )
    b = banded.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sh"),
        "b", "nib",
    )
    cand = (
        a.join(b, ["b", "nib"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .distinct()
    )
    ham = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return cand.filter(ham <= _HAM_R).select(
        "a_id", "b_id", ham.cast("long").alias("hamming")
    )


def _sql_bm25_ctes(terms_source: str, k: int, p: str) -> str:
    """sql_bm25_topk's pipeline as suffixed CTEs with the term filter
    sourced from a subquery (`terms_source` must yield one column
    `tok`); the final CTE `topk{p}` holds the ranked page."""
    from arrow_supercluster_spark.operators.relevance import B, K1

    return f"""
    sized{p} AS (
      SELECT doc_id, len({SQL_TOKS}) AS dl, {SQL_TOKS} AS toks FROM documents
    ),
    stats{p} AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM sized{p}),
    tf{p} AS (
      SELECT doc_id, dl, tok, COUNT(*) AS tf
      FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM sized{p})
      WHERE tok IN (SELECT tok FROM {terms_source})
      GROUP BY 1, 2, 3
    ),
    dfc{p} AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf{p} GROUP BY 1),
    scored{p} AS (
      SELECT doc_id,
             round(SUM(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * tf * ({K1} + 1)
               / (tf + {K1} * (1 - {B} + {B} * dl / avgdl))
             ), 6) AS score,
             COUNT(*) AS n_hits
      FROM tf{p} JOIN dfc{p} USING (tok) CROSS JOIN stats{p}
      GROUP BY doc_id
    ),
    topk{p} AS (
      SELECT doc_id, score, n_hits FROM scored{p}
      ORDER BY score DESC, doc_id LIMIT {k}
    )"""


@register(
    "q_rocchio_prf",
    f"""
    WITH seed AS (
      SELECT unnest([{", ".join(repr(t) for t in _PRF_TERMS)}]) AS tok
    ),
    {_sql_bm25_ctes("seed", _PRF_FB, "1")},
    fb AS (SELECT doc_id FROM topk1),
    fb_df AS (
      SELECT tok, COUNT(DISTINCT s.doc_id) AS dfc
      FROM (SELECT doc_id, unnest({SQL_TOKS}) AS tok FROM documents) s
      JOIN fb ON fb.doc_id = s.doc_id
      WHERE tok NOT IN (SELECT tok FROM seed)
        AND tok NOT IN ({", ".join(repr(w) for w in _PRF_STOP)})
      GROUP BY tok
    ),
    expansion AS (
      SELECT tok FROM fb_df ORDER BY dfc DESC, tok LIMIT {_PRF_EXPAND}
    ),
    qterms AS (
      SELECT tok FROM seed UNION SELECT tok FROM expansion
    ),
    {_sql_bm25_ctes("qterms", _PRF_K, "2")}
    SELECT doc_id, score, n_hits FROM topk2
    """,
)
def q_rocchio_prf(spark, sf_dir):
    """Rocchio-style pseudo-relevance feedback: (1) BM25 top-{fb} for
    the seed query, (2) expansion = top-{ex} feedback-set terms by
    document frequency (seed terms + stopwords excluded, lexical
    tie-break — a TakeOrdered over the feedback vocabulary), (3) BM25
    re-run with seed ∪ expansion, top-{k}. The only driver traffic is
    the {ex}-row expansion list; both BM25 passes keep the corpus
    distributed (postings filter inside the explode, broadcast DF/avgdl
    scalars, TakeOrdered final rank).""".format(
        fb=_PRF_FB, ex=_PRF_EXPAND, k=_PRF_K
    )
    docs = _docs(spark, sf_dir)
    fb = relevance.bm25_topk(docs, _PRF_TERMS, k=_PRF_FB).select("doc_id")
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    fb_df = (
        toks.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("tok").isin(*_PRF_TERMS))
        .filter(~F.col("tok").isin(*_PRF_STOP))
        .groupBy("tok")
        .agg(F.count_distinct("doc_id").alias("dfc"))
        .orderBy(F.desc("dfc"), F.asc("tok"))
        .limit(_PRF_EXPAND)
    )
    expansion = [r.tok for r in fb_df.collect()]
    return relevance.bm25_topk(
        docs, sorted(set(_PRF_TERMS) | set(expansion)), k=_PRF_K
    )
