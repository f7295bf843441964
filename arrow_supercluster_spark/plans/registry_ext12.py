"""Round-2 registry additions, batch 5: incremental upsert merge,
n-gram containment scoring, schema-evolution reads, and approximate
quantiles (the sketch-family companion to HLL in q_approx_distinct).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import shingles, tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_NORM, SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events


# ===========================================================================
# Incremental upsert (latest-wins merge)
# ===========================================================================

@register(
    "q_upsert_merge",
    f"""
    WITH base AS (
      SELECT doc_id, 0 AS version, md5({SQL_NORM}) AS h FROM documents
    ),
    delta AS (
      SELECT doc_id, 1 AS version,
             md5(regexp_replace(trim(lower(text || ' v2')), '\\s+', ' ', 'g')) AS h
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 100000, 1, md5(upper(substr(text, 1, 50)))
      FROM documents WHERE doc_id < 20
    ),
    unioned AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
    SELECT doc_id, version, h FROM (
      SELECT doc_id, version, h,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY version DESC) AS rk
      FROM unioned
    ) WHERE rk = 1
    """,
)
def q_upsert_merge(spark, sf_dir):
    """Pipeline — incremental latest-wins upsert (the merge-into shape of
    every continuously-ingested corpus: updated docs replace their base
    row, brand-new docs append). A synthetic delta (1/7th updated + 20
    inserts) merges against the base via one groupBy(doc_id) keeping
    max(struct(version, h)) — partial-aggregable, one shuffle keyed by
    doc_id, no window over the full corpus. At 100 TB the same plan runs
    against doc_id-bucketed storage so the merge shuffle disappears
    (see operators/bucketed.py); lakehouse MERGE INTO is this exact
    dataflow with a transaction log on top."""
    from arrow_supercluster_spark.operators.dedup import normalize_text

    docs = _docs(spark, sf_dir)
    base = docs.select(
        "doc_id", F.lit(0).alias("version"), F.md5(normalize_text(F.col("text"))).alias("h")
    )
    updates = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.lit(1).alias("version"),
        F.md5(normalize_text(F.concat(F.col("text"), F.lit(" v2")))).alias("h"),
    )
    inserts = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.lit(1).alias("version"),
        F.md5(F.upper(F.substring("text", 1, 50))).alias("h"),
    )
    unioned = base.unionByName(updates).unionByName(inserts)
    return (
        unioned.groupBy("doc_id")
        .agg(F.max(F.struct("version", "h")).alias("w"))
        .select("doc_id", F.col("w.version").alias("version"), F.col("w.h").alias("h"))
    )


# ===========================================================================
# N-gram containment (asymmetric overlap)
# ===========================================================================

_SQL_SHINGLES = (
    f"list_distinct(list_transform("
    f"generate_series(1, greatest(len({SQL_TOKS}) - 2, 1)), "
    f"i -> array_to_string(({SQL_TOKS})[i:i+2], ' ')))"
)


@register(
    "q_containment_adjacent",
    f"""
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh), 6)
             AS containment
    FROM (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents) a
    JOIN (SELECT doc_id, {_SQL_SHINGLES} AS sh FROM documents) b
      ON b.doc_id = a.doc_id + 1
    """,
)
def q_containment_adjacent(spark, sf_dir):
    """E2 companion — n-gram CONTAINMENT |A∩B|/|A| (asymmetric: detects
    a short doc swallowed by a longer one, which symmetric Jaccard
    dilutes — the Broder containment variant used for sub-document
    duplication). Distinct 3-shingle sets, adjacent-id pairs standing in
    for an LSH candidate set (same convention as q_jaccard_adjacent /
    q_edit_distance so the oracle is deterministic). The shingle
    expressions are JVM higher-order functions; the pair join is a
    broadcast-able equi-join on the derived key."""
    docs = _docs(spark, sf_dir)
    sh = F.array_distinct(shingles(tokenize(F.col("text"))))
    a = docs.select(F.col("doc_id").alias("a_id"), sh.alias("a_sh"))
    b = docs.select(F.col("doc_id").alias("b_id"), sh.alias("b_sh"))
    return (
        a.join(b, F.col("b_id") == F.col("a_id") + 1)
        .select(
            "a_id",
            "b_id",
            F.round(
                F.size(F.array_intersect("a_sh", "b_sh"))
                / F.size("a_sh").cast("double"),
                6,
            ).alias("containment"),
        )
    )


# ===========================================================================
# Schema-evolution read (mergeSchema)
# ===========================================================================

@register(
    "q_schema_merge",
    """
    SELECT doc_id, md5(text) AS text_h, NULL AS lang, NULL AS n_chars
    FROM documents
    UNION ALL
    SELECT doc_id, NULL, lang, n_chars FROM documents
    """,
)
def q_schema_merge(spark, sf_dir):
    """S-family — schema evolution: two parquet batches written with
    DIFFERENT schemas (an early batch before the lang/n_chars columns
    existed, a later batch without the text hash) read back as one
    DataFrame via mergeSchema, absent columns null-filled. This is how
    a long-lived 100 TB corpus actually looks on disk — schemas drift
    across ingestion eras; mergeSchema unions the footers without
    rewriting old data. (Per-file schema reconciliation costs a footer
    read per file — at scale, pin a table-level schema instead; this
    entry checks the drift-tolerant read itself.)"""
    docs = _docs(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="schema_rt_")
    docs.select("doc_id", F.md5("text").alias("text_h")).write.mode(
        "overwrite"
    ).parquet(f"{root}/era=0")
    docs.select("doc_id", "lang", "n_chars").write.mode("overwrite").parquet(
        f"{root}/era=1"
    )
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(root)
    )
    return merged.select(
        "doc_id",
        "text_h",
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
    )


# ===========================================================================
# Approximate quantiles (sketch family)
# ===========================================================================

@register("q_approx_quantiles", None)
def q_approx_quantiles(spark, sf_dir):
    """Sketch family (with HLL's q_approx_distinct) — per-event-type
    approximate p50/p95 via percentile_approx (Greenwald-Khanna-style
    mergeable quantile summary, the bounded-memory path when exact
    percentile's one-reducer-per-group collect is unaffordable).
    Rows-only: the sketch internals are engine-specific; the in-repo
    accuracy test (tests/test_batch5.py) bounds the error against exact
    percentile at accuracy=10000."""
    ev = read_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("approx_p"),
    ).select(
        "event_type",
        F.col("approx_p")[0].alias("p50"),
        F.col("approx_p")[1].alias("p95"),
    )
