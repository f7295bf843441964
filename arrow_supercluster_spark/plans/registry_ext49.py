"""Round-2 registry additions, batch 44 — lexical richness, experiment
guardrails, and catalog statistics:

- q_lexical_diversity: type-token ratio + hapax fraction per document;
- q_srm_check: sample-ratio-mismatch chi-square on the experiment arms
  (the guardrail that invalidates A/B readouts when assignment broke);
- q_table_profile: the ANALYZE-style (table, column) statistics sheet —
  null fraction, distinct count, min/max — across the warehouse tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events, read_table

# ===========================================================================
# Lexical diversity
# ===========================================================================

@register(
    "q_lexical_diversity",
    f"""
    WITH t AS (
      SELECT doc_id, list_filter({SQL_TOKS}, x -> x != '') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_types,
           CASE WHEN len(toks) > 0
                THEN round(len(list_distinct(toks)) * 1.0 / len(toks), 6)
                ELSE 0.0 END AS ttr,
           CASE WHEN len(list_distinct(toks)) > 0
                THEN round(len(list_filter(list_distinct(toks),
                       u -> len(list_filter(toks, x -> x = u)) = 1)) * 1.0
                     / len(list_distinct(toks)), 6)
                ELSE 0.0 END AS hapax_frac
    FROM t
    """,
)
def q_lexical_diversity(spark, sf_dir):
    """Text quality — lexical richness per document: type-token ratio
    (distinct/total tokens) and the hapax fraction (share of types
    occurring exactly once) — low TTR flags repetitive generation, a
    near-zero hapax share flags template text (the token-level siblings
    of q_char_entropy). All in-row nested HOFs with the bound-array
    idiom; zero shuffle, map-only at any scale."""
    docs = _docs(spark, sf_dir)
    toks_raw = F.filter(tokenize(F.col("text")), lambda x: x != F.lit(""))

    def inner(toks):
        n = F.size(toks)
        u = F.array_distinct(toks)
        nu = F.size(u)
        hapax = F.size(
            F.filter(u, lambda t: F.size(F.filter(toks, lambda x: x == t)) == 1)
        )
        return F.struct(
            n.alias("n_tokens"),
            nu.alias("n_types"),
            F.when(n > 0, F.round(nu * F.lit(1.0) / n, 6)).otherwise(0.0).alias("ttr"),
            F.when(nu > 0, F.round(hapax * F.lit(1.0) / nu, 6))
            .otherwise(0.0)
            .alias("hapax_frac"),
        )

    st = F.element_at(F.transform(F.array(toks_raw), inner), 1)
    return docs.select(
        "doc_id",
        st["n_tokens"].alias("n_tokens"),
        st["n_types"].alias("n_types"),
        st["ttr"].alias("ttr"),
        st["hapax_frac"].alias("hapax_frac"),
    )


# ===========================================================================
# Sample-ratio mismatch
# ===========================================================================

@register(
    "q_srm_check",
    """
    WITH arms AS (
      SELECT user_id % 2 AS arm FROM (SELECT DISTINCT user_id FROM events)
    ),
    g AS (SELECT arm, COUNT(*) AS n FROM arms GROUP BY 1),
    w AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1
      FROM g
    )
    SELECT n0, n1,
           round((n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
                 / ((n0 + n1) / 2.0)
                 + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0)
                 / ((n0 + n1) / 2.0), 6) AS chi2,
           CAST((n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0)
                / ((n0 + n1) / 2.0)
                + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0)
                / ((n0 + n1) / 2.0) > 3.841 AS INTEGER) AS srm_detected
    FROM w
    """,
)
def q_srm_check(spark, sf_dir):
    """Experimentation — sample-ratio-mismatch guardrail: chi-square of
    the arm counts against the designed 50/50 split (df=1, 5% critical
    value 3.841). SRM means assignment or logging broke and every
    downstream readout (q_ab_test, q_mann_whitney, q_ks_test) is void —
    the first check an experimentation platform runs. One distinct-user
    collapse + a 2-row agg."""
    ev = read_events(spark, sf_dir)
    arms = ev.select("user_id").distinct().select(
        (F.col("user_id") % 2).alias("arm")
    )
    g = arms.groupBy("arm").agg(F.count(F.lit(1)).alias("n"))
    w = g.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
    )
    exp = (F.col("n0") + F.col("n1")) / 2.0
    chi2 = (F.col("n0") - exp) * (F.col("n0") - exp) / exp + (
        F.col("n1") - exp
    ) * (F.col("n1") - exp) / exp
    return w.select(
        "n0", "n1",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).cast("int").alias("srm_detected"),
    )


# ===========================================================================
# Table profile
# ===========================================================================

_PROFILE_COLS = {
    "customer": ["c_custkey", "c_acctbal", "c_mktsegment"],
    "orders": ["o_orderkey", "o_totalprice", "o_orderpriority"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_returnflag"],
    "documents": ["doc_id", "lang", "n_chars"],
    "events": ["user_id", "event_type", "value"],
}


def _sql_profile_one(table: str, col: str) -> str:
    return f"""
    SELECT '{table}' AS tbl, '{col}' AS col,
           COUNT(*) AS n_rows,
           round(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS null_frac,
           COUNT(DISTINCT {col}) AS n_distinct,
           CAST(MIN({col}) AS VARCHAR) AS min_v,
           CAST(MAX({col}) AS VARCHAR) AS max_v
    FROM {table}
    """


@register(
    "q_table_profile",
    " UNION ALL ".join(
        _sql_profile_one(t, c) for t, cols in sorted(_PROFILE_COLS.items()) for c in cols
    ),
)
def q_table_profile(spark, sf_dir):
    """Catalog stats — the ANALYZE-style profile sheet: for a fixed set
    of (table, column) pairs across five warehouse tables, row count,
    null fraction, distinct count, and min/max (as strings for a
    uniform schema) — the statistics CBOs and data contracts feed on.
    One pass per table computes all its columns' stats in a single agg
    (no per-column rescans); the union is |columns| rows. Numeric
    min/max render via Spark's string cast, matched by the oracle."""
    outs = []
    for t, cols in sorted(_PROFILE_COLS.items()):
        df = (
            read_events(spark, sf_dir)
            if t == "events"
            else read_table(spark, sf_dir, t)
        )
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs.extend(
                [
                    F.round(
                        F.sum(F.col(c).isNull().cast("int")) * 1.0 / F.count(F.lit(1)),
                        6,
                    ).alias(f"nf_{c}"),
                    F.countDistinct(c).alias(f"nd_{c}"),
                    F.min(c).cast("string").alias(f"mn_{c}"),
                    F.max(c).cast("string").alias(f"mx_{c}"),
                ]
            )
        one = df.agg(*aggs)
        for c in cols:
            outs.append(
                one.select(
                    F.lit(t).alias("tbl"),
                    F.lit(c).alias("col"),
                    "n_rows",
                    F.col(f"nf_{c}").alias("null_frac"),
                    F.col(f"nd_{c}").alias("n_distinct"),
                    F.col(f"mn_{c}").alias("min_v"),
                    F.col(f"mx_{c}").alias("max_v"),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
