"""Round-2 registry additions, batch 38 — PORTABLE sketch twins: the
engine-hash MinHash/SimHash pipelines (q_dedup_minhash/q_dedup_simhash,
rows-only because xxhash64 is engine-specific) re-expressed over a
portable polynomial string hash, which makes the ENTIRE sketch algebra
oracle-checkable:

- q_minhash_portable: 16-permutation MinHash signatures per doc;
- q_minhash_estimate: signature-agreement Jaccard estimate vs EXACT
  shingle-set Jaccard for adjacent doc pairs (the estimator audit);
- q_simhash_portable: 16-bit SimHash fingerprints via per-bit votes.

Hash: h(s) = fold over chars of ((a·31 + ord(c)) mod 2³¹−1), seeded by
the first char — identical fold order both engines, so every signature
component hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.operators.dedup import shingles, tokenize

_P = 2147483647
_N_PERM = 16
# fixed permutation constants (odd multipliers, public LCG-style mixing)
_PERM_A = [2 * i * 40503 + 1 for i in range(1, _N_PERM + 1)]
_PERM_B = [i * 94261 + 12345 for i in range(1, _N_PERM + 1)]

_SQL_SHINGLES = f"""
    list_filter(
      list_transform(
        generate_series(0, greatest(len({SQL_TOKS}) - 3, 0)),
        i -> array_to_string(list_slice({SQL_TOKS}, i + 1, i + 3), ' ')
      ), s -> s != '')
"""

_SQL_POLY = """
    list_transform({shingles}, s ->
      list_reduce(list_transform(string_split(s, ''), c -> CAST(ord(c) AS BIGINT)),
                  (a, b) -> (a * 31 + b) % 2147483647))
"""


def _spark_poly_hashes(sh_col):
    """Portable polynomial hash per shingle (fold seeded by the first
    char code — list_reduce semantics)."""
    def one(s):
        codes = F.transform(
            F.split(s, ""), lambda c: F.ascii(c).cast("long")
        )
        rest = F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0)))
        return F.aggregate(
            rest,
            F.element_at(codes, 1),
            lambda a, b: (a * 31 + b) % _P,
        )

    return F.transform(sh_col, one)


def _sig_exprs_sql(hashes: str) -> str:
    cols = []
    for j in range(_N_PERM):
        cols.append(
            f"list_min(list_transform({hashes}, h ->"
            f" ({_PERM_A[j]} * h + {_PERM_B[j]}) % {_P})) AS sig_{j}"
        )
    return ", ".join(cols)


def _sig_exprs_spark(hashes):
    def perm(a, b):
        return lambda h: (a * h + b) % _P

    cols = []
    for j in range(_N_PERM):
        cols.append(
            F.array_min(
                F.transform(hashes, perm(_PERM_A[j], _PERM_B[j]))
            ).alias(f"sig_{j}")
        )
    return cols


@register(
    "q_minhash_portable",
    f"""
    WITH sh AS (
      SELECT doc_id, {_SQL_POLY.format(shingles=_SQL_SHINGLES)} AS hs
      FROM documents
    )
    SELECT doc_id, {_sig_exprs_sql('hs')}
    FROM sh WHERE len(hs) > 0
    """,
)
def q_minhash_portable(spark, sf_dir):
    """E2 upgrade — MinHash signatures over a PORTABLE polynomial hash:
    unlike q_dedup_minhash (xxhash64, engine-specific → rows-only), all
    16 permutation minima here hash-match the oracle exactly, so the
    whole Broder sketch algebra — shingling, hashing, permutation,
    min-aggregation — is differentially checked. Everything is in-row
    HOF work (char folds bound per shingle) + per-doc minima: zero
    shuffle, a map-only stage at 100 TB. The banded LSH join on top is
    q_dedup_minhash's (identical plan, different hash)."""
    docs = _docs(spark, sf_dir)
    sh = F.filter(
        shingles(tokenize(F.col("text"))), lambda s: s != F.lit("")
    )
    hashes = _spark_poly_hashes(sh)
    out = docs.select("doc_id", hashes.alias("hs")).filter(F.size("hs") > 0)
    return out.select("doc_id", *_sig_exprs_spark(F.col("hs")))


@register(
    "q_minhash_estimate",
    f"""
    WITH sh AS (
      SELECT doc_id, list_distinct({_SQL_SHINGLES}) AS ss,
             {_SQL_POLY.format(shingles=_SQL_SHINGLES)} AS hs
      FROM documents
    ),
    sigs AS (
      SELECT doc_id, ss, {_sig_exprs_sql('hs')} FROM sh WHERE len(hs) > 0
    ),
    pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             round(len(list_intersect(a.ss, b.ss)) * 1.0
                   / greatest(len(list_distinct(list_concat(a.ss, b.ss))), 1), 6)
               AS exact_jaccard,
             round(({" + ".join(f"CAST(a.sig_{j} = b.sig_{j} AS INTEGER)" for j in range(_N_PERM))})
                   * 1.0 / {_N_PERM}, 6) AS est_jaccard
      FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 1
    )
    SELECT a_id, b_id, exact_jaccard, est_jaccard,
           round(abs(exact_jaccard - est_jaccard), 6) AS abs_err
    FROM pairs
    """,
)
def q_minhash_estimate(spark, sf_dir):
    """E2 upgrade — the MinHash ESTIMATOR audit: for adjacent doc pairs,
    the signature-agreement estimate (matching components / 16) against
    the exact shingle-set Jaccard — E[est] = J is Broder's theorem, and
    with a portable hash both columns are oracle-checkable (the
    rows-only engine-hash pipeline could never expose this). Pairs are
    an id-adjacency equi-join; everything upstream is in-row."""
    docs = _docs(spark, sf_dir)
    sh_raw = F.filter(
        shingles(tokenize(F.col("text"))), lambda s: s != F.lit("")
    )
    base = docs.select(
        "doc_id",
        F.array_distinct(sh_raw).alias("ss"),
        _spark_poly_hashes(sh_raw).alias("hs"),
    ).filter(F.size("hs") > 0)
    sigs = base.select("doc_id", "ss", *_sig_exprs_spark(F.col("hs")))
    a = sigs.select(
        F.col("doc_id").alias("a_id"), F.col("ss").alias("a_ss"),
        *[F.col(f"sig_{j}").alias(f"a_sig_{j}") for j in range(_N_PERM)],
    )
    b = sigs.select(
        F.col("doc_id").alias("b_id"), F.col("ss").alias("b_ss"),
        *[F.col(f"sig_{j}").alias(f"b_sig_{j}") for j in range(_N_PERM)],
    )
    pairs = a.join(b, F.col("b_id") == F.col("a_id") + 1)
    exact = F.round(
        F.size(F.array_intersect("a_ss", "b_ss"))
        * F.lit(1.0)
        / F.greatest(F.size(F.array_union("a_ss", "b_ss")), F.lit(1)),
        6,
    )
    agree = None
    for j in range(_N_PERM):
        t = (F.col(f"a_sig_{j}") == F.col(f"b_sig_{j}")).cast("int")
        agree = t if agree is None else agree + t
    est = F.round(agree * F.lit(1.0) / _N_PERM, 6)
    return pairs.select(
        "a_id", "b_id",
        exact.alias("exact_jaccard"),
        est.alias("est_jaccard"),
        F.round(F.abs(exact - est), 6).alias("abs_err"),
    )


_SIM_BITS = 16


@register(
    "q_simhash_portable",
    f"""
    WITH tk AS (
      SELECT doc_id,
             {_SQL_POLY.format(shingles=f"list_filter({SQL_TOKS}, t -> t != '')")} AS hs
      FROM documents
    )
    SELECT doc_id,
           {" + ".join(
             f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
             for b in range(_SIM_BITS)
           )} AS simhash
    FROM tk WHERE len(hs) > 0
    """,
)
def q_simhash_portable(spark, sf_dir):
    """E2 upgrade — SimHash fingerprints over the portable token hash:
    per-bit votes (+1/−1 per token) summed in-row, bit set on positive
    vote — Charikar's sketch with every bit oracle-checkable (the
    engine-hash q_dedup_simhash is rows-only). 16 bits over 16 HOF
    sums per row; zero shuffle; Hamming-banded near-dup joins on top
    reuse the q_image_neardup plan."""
    docs = _docs(spark, sf_dir)
    toks = F.filter(tokenize(F.col("text")), lambda t: t != F.lit(""))
    hs = _spark_poly_hashes(toks)
    base = docs.select("doc_id", hs.alias("hs")).filter(F.size("hs") > 0)
    def voter(b):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    fp = None
    for b in range(_SIM_BITS):
        vote = F.aggregate(F.col("hs"), F.lit(0), voter(b))
        bit = F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return base.select("doc_id", fp.alias("simhash"))
