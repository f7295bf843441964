"""Round-7 registry additions, batch 173 — SQL-surface null and
normalization semantics (the q_set_operators / q_variant_agg family:
engine behaviors a user switching engines MUST see reproduced
exactly, each over a stated deterministic dirty fixture):

- q_null_safe_join: `<=>` (IS NOT DISTINCT FROM) vs `=` join
  semantics on a nullable key — the null-safe join matches NULL keys
  to each other, the plain equi-join drops them; both counts shipped
  side by side.
- q_not_in_nulls: THE classic SQL trap — `NOT IN (subquery)` returns
  zero rows the moment the subquery yields one NULL, while
  `NOT EXISTS` keeps its anti-join meaning. Both counts shipped; the
  differential certifies the engines agree on three-valued logic.
- q_normalized_key_join: data-cleaning join — keys match after
  trim + lower + whitespace collapse (the normalization every entity
  -resolution pipeline runs before q_record_linkage's scoring);
  raw-equality matches vs normalized matches, per source.

At 100 TB: all three are single equi-joins (the null-safe variant
hashes the same way — NULL becomes an ordinary key value); the
normalization is per-row expressions ahead of the shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs

# deterministic nullable key: NULL for doc_id % 7 == 0, else doc_id % 50
_NK_SQL = (
    "CASE WHEN doc_id % 7 = 0 THEN NULL "
    "ELSE doc_id % 50 END"
)


def _nullable_key():
    return F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
        F.col("doc_id") % 50
    )


# ===========================================================================
# R516 — null-safe join semantics
# ===========================================================================

@register(
    "q_null_safe_join",
    f"""
    WITH keyed AS (
      SELECT doc_id, {_NK_SQL} AS k FROM documents
    ),
    eq AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
    ),
    nsafe AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM keyed a JOIN keyed b
        ON a.k IS NOT DISTINCT FROM b.k AND a.doc_id < b.doc_id
    ),
    nulls AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keyed WHERE k IS NULL
    )
    SELECT eq.n AS eq_pairs, nsafe.n AS null_safe_pairs,
           nulls.n AS n_null_keys,
           nsafe.n - eq.n AS null_matched_pairs,
           nsafe.n - eq.n = nulls.n * (nulls.n - 1) / 2
             AS identity_holds
    FROM eq, nsafe, nulls
    """,
)
def q_null_safe_join(spark, sf_dir):
    """R516 — `<=>` vs `=` join semantics on a stated nullable key
    (NULL for doc_id mod 7 = 0, else doc_id mod 50): the plain
    equi-join drops NULL keys, the null-safe join pairs them, and
    the difference must equal C(n_null, 2) — shipped as the
    `identity_holds` boolean both engines must agree on. Plan: two
    hash joins (Spark's EqualNullSafe hashes NULL as an ordinary
    key — no skew cliff beyond the null group itself, stated)."""
    keyed = _docs(spark, sf_dir).select(
        "doc_id", _nullable_key().alias("k")
    )
    a = keyed.select(F.col("k").alias("ka"), F.col("doc_id").alias("da"))
    b = keyed.select(F.col("k").alias("kb"), F.col("doc_id").alias("db"))
    eq = (
        a.join(b, (F.col("ka") == F.col("kb")) & (F.col("da") < F.col("db")))
        .count()
    )
    nsafe = (
        a.join(
            b,
            F.col("ka").eqNullSafe(F.col("kb"))
            & (F.col("da") < F.col("db")),
        )
        .count()
    )
    n_null = keyed.filter(F.col("k").isNull()).count()
    return spark.createDataFrame(
        [(
            eq, nsafe, n_null, nsafe - eq,
            nsafe - eq == n_null * (n_null - 1) // 2,
        )],
        "eq_pairs long, null_safe_pairs long, n_null_keys long, "
        "null_matched_pairs long, identity_holds boolean",
    )


# ===========================================================================
# R517 — NOT IN with NULLs vs NOT EXISTS
# ===========================================================================

@register(
    "q_not_in_nulls",
    f"""
    WITH keyed AS (
      SELECT doc_id, {_NK_SQL} AS k FROM documents
    ),
    probe AS (
      SELECT doc_id % 50 AS pk FROM documents WHERE doc_id % 3 = 0
    ),
    not_in AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe
      WHERE pk NOT IN (SELECT k FROM keyed)
    ),
    not_exists AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe
      WHERE NOT EXISTS (SELECT 1 FROM keyed WHERE keyed.k = probe.pk)
    ),
    not_in_clean AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM probe
      WHERE pk NOT IN (SELECT k FROM keyed WHERE k IS NOT NULL)
    )
    SELECT not_in.n AS not_in_count,
           not_exists.n AS not_exists_count,
           not_in_clean.n AS not_in_filtered_count,
           not_in.n = 0 AS null_poisoned,
           not_exists.n = not_in_clean.n AS equivalent_after_filter
    FROM not_in, not_exists, not_in_clean
    """,
)
def q_not_in_nulls(spark, sf_dir):
    """R517 — the `NOT IN` null trap, reproduced identically in both
    engines: the keyed list contains NULLs, so `pk NOT IN (list)` is
    UNKNOWN for every probe row (count 0, `null_poisoned` = true),
    while `NOT EXISTS` stays a real anti-join; filtering the NULLs
    restores the equivalence (`equivalent_after_filter`). Spark runs
    the same three shapes: a NOT-IN via null-aware anti join
    (LeftAnti with the <=> disjunct Catalyst plans for NOT IN), a
    plain anti-join, and the filtered anti-join."""
    docs = _docs(spark, sf_dir)
    keyed = docs.select(_nullable_key().alias("k"))
    probe = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") % 50).alias("pk")
    )
    # NOT IN == null-aware anti join: express via the SQL form so
    # Catalyst plans the same null-aware semantics
    keyed.createOrReplaceTempView("_nin_keyed")
    probe.createOrReplaceTempView("_nin_probe")
    not_in = spark.sql(
        "SELECT COUNT(*) AS n FROM _nin_probe "
        "WHERE pk NOT IN (SELECT k FROM _nin_keyed)"
    ).collect()[0].n
    not_exists = probe.join(
        keyed, probe.pk == keyed.k, "left_anti"
    ).count()
    not_in_clean = probe.join(
        keyed.filter(F.col("k").isNotNull()),
        probe.pk == F.col("k"),
        "left_anti",
    ).count()
    return spark.createDataFrame(
        [(
            not_in, not_exists, not_in_clean,
            not_in == 0, not_exists == not_in_clean,
        )],
        "not_in_count long, not_exists_count long, "
        "not_in_filtered_count long, null_poisoned boolean, "
        "equivalent_after_filter boolean",
    )


# ===========================================================================
# R518 — normalized-key matching
# ===========================================================================

# doc_id % 7 decorrelates from source = src(doc_id % 20) (gcd 1), so
# every source sees every dirty class — doc_id % 4 would alias with the
# source id and leave a quarter of the sources always-clean.
_DIRTY_SQL = (
    "CASE doc_id % 7 WHEN 0 THEN upper(source) "
    "WHEN 1 THEN '  ' || source WHEN 2 THEN source || '   ' "
    "ELSE source END"
)


@register(
    "q_normalized_key_join",
    f"""
    WITH dirty AS (
      SELECT doc_id, source, {_DIRTY_SQL} AS raw_key FROM documents
    ),
    norm AS (
      SELECT doc_id, source, raw_key,
             lower(trim(regexp_replace(raw_key, ' +', ' ', 'g')))
               AS norm_key
      FROM dirty
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN raw_key = source THEN 1 ELSE 0 END)
                AS BIGINT) AS raw_matches,
           CAST(SUM(CASE WHEN norm_key = source THEN 1 ELSE 0 END)
                AS BIGINT) AS norm_matches,
           round(SUM(CASE WHEN norm_key = source THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS norm_match_rate
    FROM norm GROUP BY source ORDER BY source
    """,
)
def q_normalized_key_join(spark, sf_dir):
    """R518 — normalization before matching: a stated dirty key
    (doc_id mod 7 injects UPPERCASE, leading or trailing whitespace — mod 7 is coprime with the 20-source cycle, so every source sees every class)
    matches its clean source name only ~4/7 raw; after trim + lower +
    whitespace collapse the match rate returns to 1.0 — the cleaning
    pass every entity-resolution pipeline (q_record_linkage,
    q_jaro_winkler) runs BEFORE scoring. Pure per-row expressions
    ahead of one rollup; at scale the normalized key is also the
    join/shuffle key, so normalization placement decides skew."""
    docs = _docs(spark, sf_dir)
    raw = (
        F.when(F.col("doc_id") % 7 == 0, F.upper("source"))
        .when(F.col("doc_id") % 7 == 1, F.concat(F.lit("  "), F.col("source")))
        .when(F.col("doc_id") % 7 == 2, F.concat(F.col("source"), F.lit("   ")))
        .otherwise(F.col("source"))
    )
    norm = F.lower(F.trim(F.regexp_replace(raw, " +", " ")))
    flags = docs.select(
        "source",
        (raw == F.col("source")).cast("int").alias("raw_ok"),
        (norm == F.col("source")).cast("int").alias("norm_ok"),
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("raw_ok").cast("long").alias("raw_matches"),
            F.sum("norm_ok").cast("long").alias("norm_matches"),
            F.round(
                F.sum("norm_ok") * 1.0 / F.count(F.lit(1)), 6
            ).alias("norm_match_rate"),
        )
        .orderBy("source")
    )
