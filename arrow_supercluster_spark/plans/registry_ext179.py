"""Round-7 registry additions, batch 174 — ingestion-time corpus
hygiene (the dedup/decontamination north-star family, continued):

- q_incremental_dedup: new-batch-vs-corpus exact dedup — incoming
  documents (doc_id mod 10 ≥ 7) check their content digest against
  the EXISTING corpus digests (mod 10 < 7) and against each other;
  per-source novel / corpus-dup / batch-dup counts. The synthetic
  corpus is duplicate-free, so the batch is a stated RE-CRAWL
  fixture: docs ≡9 (mod 10) re-fetch their decade-base page (corpus
  dup), docs ≡8 double-fetch the decade's ≡7 page (batch dup) — the
  self-join injection both engines build identically. Corpus side
  reduces to DISTINCT digests before the join, so history is touched
  once per digest, not once per document.
- q_split_leakage: train/test contamination audit — after the
  deterministic hash holdout split (the q_holdout_split rule), how
  many test documents share an exact content digest with ANY train
  document. Same stated injection (docs ≡12 mod 13 mirror their
  13-base page): the pair's two sides land in train/test by
  independent hash draws, so a fraction of mirrors straddle the
  boundary and the leak rate is non-trivially positive. The
  eval-hygiene check that catches leakage BEFORE a benchmark number
  ships; q_decontaminate covers external eval sets, this covers the
  in-corpus split itself.
- q_length_sweep: survival table for a min-token-cutoff grid — docs
  and tokens retained at each cutoff, the curve a data-mix plan reads
  before committing to a filter threshold (cutting at 64 tokens
  sounds harmless until the table says it drops 40% of a source).

At 100 TB: digests shuffle, text never does (the q_dedup_exact
discipline); the sweep is one token-count projection cross-joined
with a literal grid, partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_ID_CUTFRAC = "doc_id % 10 < 7"          # 70% existing corpus
_SL_TEST_MOD = 5                          # 1-in-5 hash holdout
_LS_GRID = (8, 16, 32, 64, 128)

# md5 of the normalized text — the q_dedup_exact digest rule
_SQL_DIGEST = "md5(lower(trim(text)))"


def _digest():
    return F.md5(F.lower(F.trim(F.col("text"))))


# ===========================================================================
# R519 — incremental (new-batch-vs-corpus) exact dedup
# ===========================================================================

@register(
    "q_incremental_dedup",
    f"""
    WITH recrawled AS (
      SELECT d.doc_id, d.source,
             CASE WHEN d.doc_id % 10 = 9 THEN COALESCE(b.text, d.text)
                  WHEN d.doc_id % 10 = 8 THEN COALESCE(s7.text, d.text)
                  ELSE d.text END AS text
      FROM documents d
      LEFT JOIN documents b
        ON d.doc_id % 10 = 9 AND b.doc_id = d.doc_id - 9
      LEFT JOIN documents s7
        ON d.doc_id % 10 = 8 AND s7.doc_id = d.doc_id - 1
    ),
    corpus AS (
      SELECT DISTINCT {_SQL_DIGEST} AS dg FROM recrawled
      WHERE doc_id % 10 < 7
    ),
    incoming AS (
      SELECT doc_id, source, {_SQL_DIGEST} AS dg FROM recrawled
      WHERE doc_id % 10 >= 7
    ),
    flagged AS (
      SELECT i.source,
             CASE WHEN c.dg IS NOT NULL THEN 1 ELSE 0 END AS corpus_dup,
             CASE WHEN c.dg IS NULL AND COUNT(*) OVER (
                    PARTITION BY i.dg) > 1
                  AND i.doc_id > MIN(i.doc_id) OVER (PARTITION BY i.dg)
                  THEN 1 ELSE 0 END AS batch_dup
      FROM incoming i LEFT JOIN corpus c ON c.dg = i.dg
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(SUM(corpus_dup) AS BIGINT) AS n_corpus_dups,
           CAST(SUM(batch_dup) AS BIGINT) AS n_batch_dups,
           CAST(SUM(CASE WHEN corpus_dup = 0 AND batch_dup = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
    FROM flagged GROUP BY source ORDER BY source
    """,
)
def q_incremental_dedup(spark, sf_dir):
    """R519 — nightly-ingest dedup over the stated re-crawl fixture
    (the corpus is duplicate-free, so docs ≡9 mod 10 re-fetch their
    decade-base page and docs ≡8 double-fetch the decade\'s ≡7 page —
    a deterministic self-join injection): incoming docs (mod 10 ≥ 7)
    classify as corpus-dup (digest already in the existing corpus),
    batch-dup (first occurrence inside the batch keeps — min-doc_id
    rule), or novel. The corpus side is DISTINCT digests (32-byte
    keys), so at 100 TB history costs one digest-set semi-join, not a
    re-scan of every old document; the within-batch keeper is a
    digest-partitioned window over the BATCH only."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    b = docs.select(
        (F.col("doc_id") + 9).alias("tid"), F.col("text").alias("btext")
    )
    s7 = docs.select(
        (F.col("doc_id") + 1).alias("tid7"), F.col("text").alias("s7text")
    )
    recrawled = (
        docs.join(b, (F.col("doc_id") % 10 == 9)
                  & (F.col("doc_id") == F.col("tid")), "left")
        .join(s7, (F.col("doc_id") % 10 == 8)
              & (F.col("doc_id") == F.col("tid7")), "left")
        .select(
            "doc_id", "source",
            F.when(F.col("doc_id") % 10 == 9,
                   F.coalesce("btext", "text"))
            .when(F.col("doc_id") % 10 == 8,
                  F.coalesce("s7text", "text"))
            .otherwise(F.col("text")).alias("text"),
        )
    )
    cut = F.col("doc_id") % 10 < 7
    corpus = recrawled.filter(cut).select(_digest().alias("dg")).distinct()
    incoming = recrawled.filter(~cut).select(
        "doc_id", "source", _digest().alias("dg")
    )
    j = incoming.join(
        corpus.withColumnRenamed("dg", "cdg"),
        incoming.dg == F.col("cdg"),
        "left",
    )
    w = Window.partitionBy("dg")
    flagged = j.select(
        "source",
        F.when(F.col("cdg").isNotNull(), 1).otherwise(0).alias("corpus_dup"),
        F.when(
            F.col("cdg").isNull()
            & (F.count(F.lit(1)).over(w) > 1)
            & (F.col("doc_id") > F.min("doc_id").over(w)),
            1,
        ).otherwise(0).alias("batch_dup"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sum("corpus_dup").cast("long").alias("n_corpus_dups"),
            F.sum("batch_dup").cast("long").alias("n_batch_dups"),
            F.sum(
                F.when(
                    (F.col("corpus_dup") == 0) & (F.col("batch_dup") == 0), 1
                ).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .orderBy("source")
    )


# ===========================================================================
# R520 — train/test split leakage audit
# ===========================================================================

@register(
    "q_split_leakage",
    f"""
    WITH mirrored AS (
      SELECT d.doc_id, d.source,
             CASE WHEN d.doc_id % 13 = 12 THEN COALESCE(m.text, d.text)
                  ELSE d.text END AS text
      FROM documents d
      LEFT JOIN documents m
        ON d.doc_id % 13 = 12 AND m.doc_id = d.doc_id - 12
    ),
    split AS (
      SELECT doc_id, source, {_SQL_DIGEST} AS dg,
             (doc_id * 2654435761 + 40503) % {_SL_TEST_MOD} = 0 AS is_test
      FROM mirrored
    ),
    train_dg AS (
      SELECT DISTINCT dg FROM split WHERE NOT is_test
    )
    SELECT s.source,
           CAST(SUM(CASE WHEN s.is_test THEN 1 ELSE 0 END) AS BIGINT)
             AS n_test,
           CAST(SUM(CASE WHEN s.is_test AND t.dg IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
           round(SUM(CASE WHEN s.is_test AND t.dg IS NOT NULL
                     THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN s.is_test THEN 1 ELSE 0 END), 0),
                 6) AS leak_rate
    FROM split s LEFT JOIN train_dg t ON t.dg = s.dg AND s.is_test
    GROUP BY s.source ORDER BY s.source
    """,
)
def q_split_leakage(spark, sf_dir):
    """R520 — holdout-split contamination over the stated mirror
    fixture (docs ≡12 mod 13 carry their 13-base page\'s text; the
    corpus itself is duplicate-free): the deterministic Knuth-hash
    split (1-in-{m} test, the q_holdout_split rule) audited for
    exact-content leakage — test docs whose digest also appears in
    train. Mirror pairs land in train/test by independent hash
    draws, so a predictable fraction straddles the boundary and the
    leak rate is positive (asserted in tests) — exactly why this
    audit must run before any benchmark number ships. Digest-only
    semi-join; text never shuffles.""".format(m=_SL_TEST_MOD)
    docs = _docs(spark, sf_dir)
    m = docs.select(
        (F.col("doc_id") + 12).alias("mid"), F.col("text").alias("mtext")
    )
    mirrored = (
        docs.join(m, (F.col("doc_id") % 13 == 12)
                  & (F.col("doc_id") == F.col("mid")), "left")
        .select(
            "doc_id", "source",
            F.when(F.col("doc_id") % 13 == 12,
                   F.coalesce("mtext", "text"))
            .otherwise(F.col("text")).alias("text"),
        )
    )
    is_test = (F.col("doc_id") * 2654435761 + 40503) % _SL_TEST_MOD == 0
    split = mirrored.select(
        "doc_id", "source", _digest().alias("dg"), is_test.alias("is_test")
    )
    train_dg = (
        split.filter(~F.col("is_test")).select("dg").distinct()
        .withColumnRenamed("dg", "tdg")
    )
    j = split.join(
        train_dg,
        (split.dg == F.col("tdg")) & split.is_test,
        "left",
    )
    n_test = F.sum(F.when(F.col("is_test"), 1).otherwise(0))
    n_leak = F.sum(
        F.when(F.col("is_test") & F.col("tdg").isNotNull(), 1).otherwise(0)
    )
    return (
        j.groupBy("source")
        .agg(
            n_test.cast("long").alias("n_test"),
            n_leak.cast("long").alias("n_leaked"),
            F.round(
                n_leak * 1.0 / F.nullif(n_test, F.lit(0)), 6
            ).alias("leak_rate"),
        )
        .orderBy("source")
    )


# ===========================================================================
# R521 — length-cutoff survival sweep
# ===========================================================================

_LS_SQL_GRID = ", ".join(str(g) for g in _LS_GRID)


@register(
    "q_length_sweep",
    f"""
    WITH lens AS (
      SELECT source, len({SQL_TOKS}) AS toks FROM documents
    ),
    grid AS (SELECT UNNEST([{_LS_SQL_GRID}]) AS min_toks),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS all_docs,
             CAST(SUM(toks) AS BIGINT) AS all_toks
      FROM lens
    )
    SELECT grid.min_toks,
           CAST(SUM(CASE WHEN lens.toks >= grid.min_toks
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
           CAST(SUM(CASE WHEN lens.toks >= grid.min_toks
                    THEN lens.toks ELSE 0 END) AS BIGINT) AS tokens_kept,
           round(SUM(CASE WHEN lens.toks >= grid.min_toks
                     THEN 1 ELSE 0 END) * 1.0 / tot.all_docs, 6)
             AS doc_survival,
           round(SUM(CASE WHEN lens.toks >= grid.min_toks
                     THEN lens.toks ELSE 0 END) * 1.0 / tot.all_toks, 6)
             AS token_survival
    FROM lens CROSS JOIN grid CROSS JOIN tot
    GROUP BY grid.min_toks, tot.all_docs, tot.all_toks
    ORDER BY grid.min_toks
    """,
)
def q_length_sweep(spark, sf_dir):
    """R521 — min-length filter survival curve: docs and tokens
    retained at each cutoff in {g} — the table a data-mix plan reads
    before committing to a length filter (token survival falls much
    slower than doc survival because short docs carry few tokens;
    the gap IS the quality/volume trade). One token-count projection
    cross-joined with the {k}-row literal grid, partial-aggregated
    map-side — the corpus is scanned once, not once per cutoff.""".format(
        g=_LS_GRID, k=len(_LS_GRID)
    )
    docs = _docs(spark, sf_dir)
    lens = docs.select(
        "source", F.size(tokenize(F.col("text"))).alias("toks")
    )
    tot = lens.agg(
        F.count(F.lit(1)).alias("all_docs"),
        F.sum("toks").alias("all_toks"),
    )
    grid = spark.createDataFrame([(g,) for g in _LS_GRID], "min_toks int")
    keep = F.col("toks") >= F.col("min_toks")
    return (
        lens.crossJoin(F.broadcast(grid))
        .crossJoin(F.broadcast(tot))
        .groupBy("min_toks", "all_docs", "all_toks")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long")
            .alias("docs_kept"),
            F.sum(F.when(keep, F.col("toks")).otherwise(0)).cast("long")
            .alias("tokens_kept"),
        )
        .select(
            "min_toks", "docs_kept", "tokens_kept",
            F.round(
                F.col("docs_kept") * 1.0 / F.col("all_docs"), 6
            ).alias("doc_survival"),
            F.round(
                F.col("tokens_kept") * 1.0 / F.col("all_toks"), 6
            ).alias("token_survival"),
        )
        .orderBy("min_toks")
    )
