"""Round-6 registry additions, batch 149 — web-corpus curation
plumbing a training-data pipeline actually runs:

- q_url_canonicalize: URL canonicalization + dedup rollup — lowercase
  scheme/host, strip the fragment, drop utm_* tracking params, sort
  the surviving query params, strip the www. prefix, then count
  documents per canonical URL. THE first dedup pass of every web
  crawl (CommonCrawl dedups by canonical URL before any content
  hash); URLs are synthesized deterministically from (source, doc_id)
  so both engines canonicalize the identical dirty inputs.
- q_luhn_check: Luhn checksum validation over candidate 16-digit
  numbers — the verification step behind credit-card PII scrubbing
  (q_pii_scrub finds digit runs; only checksum-VALID runs are card
  numbers, the rest are order ids and timestamps — skipping the
  check multiplies the false-positive redaction rate ~10×).
- q_pack_sequences: sequence packing for training — first-fit-
  decreasing bin packing of document token counts into 512-token
  context windows, run INDEPENDENTLY per deterministic doc_id%8
  group (exactly how distributed packing works at scale: partitions
  pack locally, bins never cross partitions), reported against the
  LP lower bound ceil(total/512). Rows-only: FFD is inherently
  sequential per group; the python oracle in tests replays it.

At 100 TB: canonicalization is pure per-row expressions; Luhn is a
64-op integer fold per candidate; packing is one shuffle on the group
key then per-group linear FFD with bounded state (open-bin list ≤
bins per group).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_PACK_CTX = 512
_PACK_GROUPS = 8


# ===========================================================================
# R440 — URL canonicalization + dedup rollup
# ===========================================================================

# dirty URL synthesized from (source, doc_id): uppercase scheme/host,
# a www. prefix, tracking params AROUND a meaningful id param, and a
# fragment — every piece the canonicalizer must handle.
_SQL_RAW_URL = (
    "'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM/s/' "
    "|| CAST(doc_id % 7 AS VARCHAR) "
    "|| '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR) "
    "|| '&utm_campaign=retrain&ref=rss#sec-' || CAST(doc_id % 3 AS VARCHAR)"
)


@register(
    "q_url_canonicalize",
    f"""
    WITH raw AS (
      SELECT doc_id, {_SQL_RAW_URL} AS url FROM documents
    ),
    defrag AS (
      SELECT doc_id, string_split(url, '#')[1] AS u FROM raw
    ),
    parts AS (
      SELECT doc_id,
             lower(string_split(u, '?')[1]) AS base,
             string_split(u, '?')[2] AS qs
      FROM defrag
    ),
    canon AS (
      SELECT doc_id,
             replace(base, 'https://www.', 'https://')
             || CASE WHEN len(list_filter(string_split(qs, '&'),
                                          p -> p NOT LIKE 'utm_%')) > 0
                THEN '?' || array_to_string(
                       list_sort(list_filter(string_split(qs, '&'),
                                             p -> p NOT LIKE 'utm_%')),
                       '&')
                ELSE '' END AS curl
      FROM parts
    )
    SELECT curl AS canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keeper_id
    FROM canon GROUP BY curl ORDER BY curl
    """,
)
def q_url_canonicalize(spark, sf_dir):
    """R440 — canonical-URL dedup rollup: defragment, lowercase the
    scheme+host half (the synthetic path carries no significant case),
    drop utm_* params, sort the survivors, strip www., then group.
    Pure per-row string/array expressions (whole-stage codegen, no
    UDF); the rollup is one partial-aggregated groupBy on the
    canonical key. 350 distinct canonical URLs collapse the corpus —
    the crawl-side dedup that runs BEFORE any content hash."""
    docs = _docs(spark, sf_dir)
    raw_url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper("source"),
        F.lit(".EXAMPLE.COM/s/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("&utm_campaign=retrain&ref=rss#sec-"),
        (F.col("doc_id") % 3).cast("string"),
    )
    defrag = docs.select(
        "doc_id", F.split(raw_url, "#").getItem(0).alias("u")
    )
    parts = defrag.select(
        "doc_id",
        F.lower(F.split("u", r"\?").getItem(0)).alias("base"),
        F.split("u", r"\?").getItem(1).alias("qs"),
    )
    kept = F.filter(
        F.split("qs", "&"), lambda p: ~p.startswith("utm_")
    )
    curl = F.concat(
        F.regexp_replace("base", "^https://www\\.", "https://"),
        F.when(
            F.size(kept) > 0,
            F.concat(F.lit("?"), F.array_join(F.array_sort(kept), "&")),
        ).otherwise(F.lit("")),
    )
    canon = parts.select("doc_id", curl.alias("curl"))
    return (
        canon.groupBy(F.col("curl").alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_id"),
        )
        .orderBy("canonical_url")
    )


# ===========================================================================
# R441 — Luhn checksum validation
# ===========================================================================

_SQL_CAND = (
    "lpad(CAST((doc_id * 2654435761 + 40490) % 10000000000000000 "
    "AS VARCHAR), 16, '0')"
)


@register(
    "q_luhn_check",
    f"""
    WITH cand AS (
      SELECT doc_id, {_SQL_CAND} AS num FROM documents
    ),
    checked AS (
      SELECT doc_id, num,
        list_sum(list_transform(range(1, 17), i ->
          CASE WHEN i % 2 = 1 THEN
            CASE WHEN 2 * CAST(substring(num, i, 1) AS INTEGER) > 9
                 THEN 2 * CAST(substring(num, i, 1) AS INTEGER) - 9
                 ELSE 2 * CAST(substring(num, i, 1) AS INTEGER) END
          ELSE CAST(substring(num, i, 1) AS INTEGER) END
        )) % 10 = 0 AS luhn_valid
      FROM cand
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN luhn_valid THEN 1 ELSE 0 END) AS BIGINT)
             AS n_valid,
           round(SUM(CASE WHEN luhn_valid THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS valid_rate
    FROM checked
    """,
)
def q_luhn_check(spark, sf_dir):
    """R441 — Luhn over deterministic 16-digit candidates (Knuth-hash
    expansion of doc_id): for a 16-digit string, double the digits at
    odd 1-based positions (even offsets from the right), subtract 9
    when the double exceeds 9, and accept when the total ≡ 0 (mod 10).
    A pure 16-term integer fold per row — whole-stage codegen, no UDF.
    Valid rate ≈ 1/10 by construction (Luhn accepts one residue class),
    asserted in tests; the operational point is PII-scrub precision:
    digit runs that FAIL Luhn are order ids, not card numbers."""
    docs = _docs(spark, sf_dir)
    num = F.lpad(
        ((F.col("doc_id") * 2654435761 + 40490) % 10000000000000000)
        .cast("string"),
        16,
        "0",
    )
    cand = docs.select("doc_id", num.alias("num"))
    digit = lambda i: F.substring("num", i, 1).cast("int")  # noqa: E731
    terms = []
    for i in range(1, 17):
        if i % 2 == 1:
            terms.append(
                F.when(2 * digit(i) > 9, 2 * digit(i) - 9).otherwise(
                    2 * digit(i)
                )
            )
        else:
            terms.append(digit(i))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    checked = cand.select((total % 10 == 0).alias("luhn_valid"))
    return checked.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("luhn_valid"), 1).otherwise(0))
        .cast("long").alias("n_valid"),
        F.round(
            F.sum(F.when(F.col("luhn_valid"), 1).otherwise(0)) * 1.0
            / F.count(F.lit(1)),
            4,
        ).alias("valid_rate"),
    )


# ===========================================================================
# R442 — sequence packing (per-group first-fit-decreasing)
# ===========================================================================

@register("q_pack_sequences", None)
def q_pack_sequences(spark, sf_dir):
    """R442 — training-sequence packing: documents are split into
    {g} deterministic groups (doc_id % {g} — at scale this is the
    shuffle key and each partition packs locally; bins never cross
    partitions, so the plan is embarrassingly parallel), token
    lengths clip at the {c}-token context, and each group runs exact
    first-fit-decreasing (length DESC, doc_id ASC tie-break) in an
    applyInPandas kernel with state bounded by the group's open-bin
    list. Output per group: docs, total tokens, FFD bins, the LP
    lower bound ceil(total/{c}), and the fill rate. Rows-only (FFD is
    sequential within a group by nature); the python oracle in tests
    replays the identical FFD and checks every group.""".format(
        g=_PACK_GROUPS, c=_PACK_CTX
    )
    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.least(
            F.size(tokenize(F.col("text"))), F.lit(_PACK_CTX)
        ).alias("toks"),
        (F.col("doc_id") % _PACK_GROUPS).alias("grp"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["toks", "doc_id"], ascending=[False, True]
        )
        bins: list[int] = []  # remaining capacity per open bin
        for t in pdf["toks"]:
            t = int(t)
            for i, rem in enumerate(bins):
                if rem >= t:
                    bins[i] = rem - t
                    break
            else:
                bins.append(_PACK_CTX - t)
        total = int(pdf["toks"].sum())
        n_bins = len(bins)
        lp = -(-total // _PACK_CTX)
        return pd.DataFrame(
            {
                "grp": [int(pdf["grp"].iloc[0])],
                "n_docs": [len(pdf)],
                "total_tokens": [total],
                "n_bins": [n_bins],
                "lp_lower_bound": [lp],
                "fill_rate": [round(total / (n_bins * _PACK_CTX), 4)],
            }
        )

    return (
        docs.groupBy("grp")
        .applyInPandas(
            pack,
            schema="grp long, n_docs long, total_tokens long, "
            "n_bins long, lp_lower_bound long, fill_rate double",
        )
        .orderBy("grp")
    )
