"""Round-4 registry additions, batch 82 — fuzzy matching, change-history
dimensions, and winnowing fingerprints:

- q_jaro_winkler: Jaro-Winkler similarity for adjacent-doc pairs — the
  record-linkage string metric (Winkler 1990) complementing exact
  Levenshtein (q_edit_distance). Spark has no built-in JW, so the kernel
  is the repo's one deliberate Arrow-batched Python metric
  (textops.jaro_winkler_col); the oracle is DuckDB's native
  jaro_winkler_similarity — a true cross-ENGINE differential of a
  nontrivial algorithm (bit-exact on 3000 randomized probe pairs,
  including DuckDB's floor-division transposition convention).
- q_scd2_dim: Slowly-Changing-Dimension Type 2 build — per-customer
  order-priority change history as effective-dated version rows
  (valid_from / valid_to / is_current). The warehouse twin of
  q_upsert_merge's Type-1 overwrite. All windows partition by customer
  (bounded frames — passes the registry window gate).
- q_winnow_fingerprints: winnowing fingerprint selection (Schleimer,
  Wilkerson & Aiken 2003, the MOSS algorithm): per doc, hash all word
  4-grams and keep the minimum hash of every sliding window of 5 —
  guarantees any shared run of >= 8 words between two docs shares a
  fingerprint, with ~2/(w+1) of the grams kept. The fingerprint table is
  the sublinear-index alternative to q_dup_spans' full posting list.

At 100 TB: JW and SCD2 are narrow maps / bounded-key windows; winnowing
explodes each doc once and aggregates per (doc, fingerprint) — shuffle
carries md5 digests, never text.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import textops
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_NORM, SQL_TOKS, _docs
from arrow_supercluster_spark.operators.dedup import normalize_text, tokenize

_JW_PREFIX = 24  # chars of normalized text compared (bounds the O(len²) scan)


@register(
    "q_jaro_winkler",
    f"""
    WITH p AS (SELECT doc_id, substring({SQL_NORM}, 1, {_JW_PREFIX}) AS s
               FROM documents)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           jaro_winkler_similarity(a.s, b.s) AS jw
    FROM p a JOIN p b ON b.doc_id = a.doc_id + 1
    """,
)
def q_jaro_winkler(spark, sf_dir):
    """Fuzzy matching — Jaro-Winkler over adjacent-doc 24-char normalized
    prefixes. The Python kernel (textops.jaro_winkler_py) reproduces
    DuckDB's convention exactly: greedy left-to-right match within the
    floor(max_len/2)-1 window, transpositions = mismatched_matches // 2
    (INTEGER floor — the textbook t/2 differs on odd counts), boost only
    when jaro > 0.7, prefix capped at 4, p = 0.1."""
    p = _docs(spark, sf_dir).select(
        "doc_id",
        F.substring(normalize_text(F.col("text")), 1, _JW_PREFIX).alias("s"),
    )
    a = p.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa"))
    b = p.select((F.col("doc_id") - 1).alias("a_id"), F.col("doc_id").alias("b_id"), F.col("s").alias("sb"))
    return (
        a.join(b, "a_id")
        .select(
            "a_id", "b_id",
            textops.jaro_winkler_col(F.col("sa"), F.col("sb")).alias("jw"),
        )
    )


@register(
    "q_scd2_dim",
    """
    WITH seq AS (
      SELECT o_custkey AS custkey, o_orderpriority AS priority,
             o_orderdate AS d, o_orderkey AS k,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev
      FROM orders
    ),
    isl AS (
      SELECT custkey, priority, d,
             CAST(SUM(CASE WHEN prev IS NULL OR prev <> priority
                           THEN 1 ELSE 0 END) OVER (
               PARTITION BY custkey ORDER BY d, k
             ) AS BIGINT) AS version
      FROM seq
    ),
    runs AS (
      SELECT custkey, version, MIN(priority) AS priority,
             MIN(d) AS valid_from, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM isl GROUP BY custkey, version
    )
    SELECT custkey, version, priority, valid_from, n_orders,
           lead(valid_from) OVER (
             PARTITION BY custkey ORDER BY version
           ) AS valid_to,
           CASE WHEN lead(valid_from) OVER (
             PARTITION BY custkey ORDER BY version
           ) IS NULL THEN TRUE ELSE FALSE END AS is_current
    FROM runs
    """,
)
def q_scd2_dim(spark, sf_dir):
    """Warehouse — SCD Type-2 dimension build: per-customer priority
    change history with effective-date ranges. Gaps-and-islands over
    (orderdate, orderkey) order: version = running count of change
    points, runs collapse to one row each, valid_to = next version's
    valid_from (NULL = current). Every window partitions by custkey —
    frames bounded by a customer's order count."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderkey").alias("k"),
        F.lag("o_orderpriority").over(w_seq).alias("prev"),
    )
    w_ver = Window.partitionBy("custkey").orderBy("d", "k")
    isl = seq.select(
        "custkey", "priority", "d",
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("prev") != F.col("priority")), 1)
            .otherwise(0)
        ).over(w_ver).cast("long").alias("version"),
    )
    runs = isl.groupBy("custkey", "version").agg(
        F.min("priority").alias("priority"),
        F.min("d").alias("valid_from"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w_cur = Window.partitionBy("custkey").orderBy("version")
    nxt = F.lead("valid_from").over(w_cur)
    return runs.select(
        "custkey", "version", "priority", "valid_from", "n_orders",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


_WIN_K = 4  # words per gram
_WIN_W = 5  # grams per winnowing window


@register(
    "q_winnow_fingerprints",
    f"""
    WITH toked AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
    pg AS (
      SELECT doc_id, i AS pos, len(toks) - {_WIN_K} + 1 AS n_grams,
             md5(array_to_string(toks[i:i+{_WIN_K}-1], ' ')) AS g
      FROM toked, unnest(generate_series(1, len(toks) - {_WIN_K} + 1)) AS u(i)
      WHERE len(toks) >= {_WIN_K}
    ),
    wins AS (
      SELECT doc_id, pos, n_grams,
             MIN(g) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW
                          AND {_WIN_W - 1} FOLLOWING) AS fp
      FROM pg WHERE n_grams >= {_WIN_W}
    )
    SELECT doc_id, fp,
           CAST(MIN(pos) AS BIGINT) AS first_win,
           CAST(COUNT(*) AS BIGINT) AS n_wins
    FROM wins WHERE pos <= n_grams - {_WIN_W} + 1
    GROUP BY doc_id, fp
    """,
)
def q_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS): min-hash of each sliding window of w=5 word
    4-gram md5s, deduplicated per doc with the first window position
    and window-win count. Guarantee: two docs sharing >= k+w-1 = 8
    consecutive words share a fingerprint (tested); expected density
    2/(w+1) of grams. The per-doc window frame is bounded (CURRENT ROW
    .. w-1 FOLLOWING, partitioned by doc) — gate-clean. At scale the
    fingerprint table joins doc-to-doc candidates on fp equality, a
    sublinear alternative to the full q_dup_spans posting list."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
    grams = (
        toks.filter(F.size("toks") >= _WIN_K)
        .select(
            "doc_id",
            (F.size("toks") - _WIN_K + 1).alias("n_grams"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - _WIN_K + 1),
                    lambda i: F.md5(
                        F.array_join(F.slice(F.col("toks"), i, _WIN_K), " ")
                    ),
                )
            ).alias("pos0", "g"),
        )
        .select(
            "doc_id", "n_grams", (F.col("pos0") + 1).alias("pos"), "g"
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    wins = (
        grams.filter(F.col("n_grams") >= _WIN_W)
        .select(
            "doc_id", "pos", "n_grams", F.min("g").over(w).alias("fp")
        )
        .filter(F.col("pos") <= F.col("n_grams") - _WIN_W + 1)
    )
    return wins.groupBy("doc_id", "fp").agg(
        F.min("pos").cast("long").alias("first_win"),
        F.count(F.lit(1)).alias("n_wins"),
    )
