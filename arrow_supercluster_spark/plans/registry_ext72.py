"""Round-2 registry additions, batch 67 — the LSH banding S-curve,
empirically:

- q_lsh_bands_sweep: candidate-pair counts when the 16 portable MinHash
  signature components are banded as 2×8 / 4×4 / 8×2 — the
  bands-vs-rows tradeoff (more bands = more candidates = higher recall,
  lower precision) measured on the actual corpus, fully oracle-checked
  because the signatures are the portable-hash ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.plans.registry_ext43 import (
    _N_PERM,
    _SQL_POLY,
    _SQL_SHINGLES,
    _sig_exprs_spark,
    _sig_exprs_sql,
    _spark_poly_hashes,
)
from arrow_supercluster_spark.operators.dedup import shingles, tokenize

_BANDINGS = (2, 4, 8)  # bands of 8 / 4 / 2 rows over the 16 components


def _sql_band_pairs(n_bands: int) -> str:
    rows = _N_PERM // n_bands
    band_keys = ", ".join(
        "md5("
        + " || '|' || ".join(
            f"CAST(sig_{b * rows + j} AS VARCHAR)" for j in range(rows)
        )
        + f") AS bk_{b}"
        for b in range(n_bands)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, bk_{b} AS bk FROM banded"
        for b in range(n_bands)
    )
    return f"""
    SELECT {n_bands} AS n_bands, {rows} AS rows_per_band,
           COUNT(*) AS n_candidate_pairs
    FROM (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM (
        WITH sh AS (
          SELECT doc_id, {_SQL_POLY.format(shingles=_SQL_SHINGLES)} AS hs
          FROM documents
        ),
        sigs AS (
          SELECT doc_id, {_sig_exprs_sql('hs')} FROM sh WHERE len(hs) > 0
        ),
        banded AS (SELECT doc_id, {band_keys} FROM sigs)
        {unions}
      ) a
      JOIN (
        WITH sh AS (
          SELECT doc_id, {_SQL_POLY.format(shingles=_SQL_SHINGLES)} AS hs
          FROM documents
        ),
        sigs AS (
          SELECT doc_id, {_sig_exprs_sql('hs')} FROM sh WHERE len(hs) > 0
        ),
        banded AS (SELECT doc_id, {band_keys} FROM sigs)
        {unions}
      ) b ON a.band_idx = b.band_idx AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    """


@register(
    "q_lsh_bands_sweep",
    " UNION ALL ".join(_sql_band_pairs(nb) for nb in _BANDINGS),
)
def q_lsh_bands_sweep(spark, sf_dir):
    """Dedup tuning — the LSH BANDING S-curve measured: distinct
    candidate pairs when the 16 portable signature components band as
    2×8, 4×4, 8×2. More bands with fewer rows fire at lower Jaccard
    (P(candidate) = 1−(1−J^r)^b), so the candidate count climbs — the
    empirical version of the curve every banding choice is made from,
    and with PORTABLE signatures (q_minhash_portable) both engines
    compute the identical pair set. Per banding: band keys in-row,
    one band-keyed equi-join, a distinct-pair count."""
    docs = _docs(spark, sf_dir)
    sh = F.filter(shingles(tokenize(F.col("text"))), lambda s: s != F.lit(""))
    sigs = (
        docs.select("doc_id", _spark_poly_hashes(sh).alias("hs"))
        .filter(F.size("hs") > 0)
        .select("doc_id", *_sig_exprs_spark(F.col("hs")))
        .localCheckpoint(eager=False)
    )
    outs = []
    for n_bands in _BANDINGS:
        rows = _N_PERM // n_bands
        band_cols = [
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"sig_{b * rows + j}").cast("string")
                        for j in range(rows)
                    ],
                )
            ).alias(f"bk_{b}")
            for b in range(n_bands)
        ]
        banded = sigs.select("doc_id", *band_cols)
        tall = None
        for b in range(n_bands):
            part = banded.select(
                "doc_id", F.lit(b).alias("band_idx"), F.col(f"bk_{b}").alias("bk")
            )
            tall = part if tall is None else tall.unionByName(part)
        a = tall.select(
            F.col("doc_id").alias("a_id"), "band_idx", "bk"
        )
        b_side = tall.select(
            F.col("doc_id").alias("b_id"), "band_idx", "bk"
        )
        n_pairs = (
            a.join(b_side, ["band_idx", "bk"])
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
            .count()
        )
        outs.append((n_bands, rows, n_pairs))
    return spark.createDataFrame(
        outs, "n_bands int, rows_per_band int, n_candidate_pairs long"
    )
