"""Round-2 registry additions, batch 25 — classic decision-support
operators over the curation surface:

- q_skyline: Pareto frontier (skyline) of documents on (quality,
  length) — the multi-criteria shortlist operator;
- q_apportion: largest-remainder (Hamilton) apportionment of a fixed
  sampling budget across languages — exact proportional quota
  allocation, the budgeted-sampling companion of q_stratified_sample;
- q_conversion_latency: per-user view→purchase latency and its
  per-arm percentiles — the funnel-timing readout.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# Skyline (Pareto frontier)
# ===========================================================================

# quality proxy: alpha ratio rounded to 3 (ties are common -> the
# dominance test gets exercised on equal coordinates)
_SQL_QUAL = (
    "round(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0"
    " / greatest(length(text), 1), 3)"
)


@register(
    "q_skyline",
    f"""
    WITH scored AS (
      SELECT doc_id, n_chars, {_SQL_QUAL} AS quality FROM documents
    )
    SELECT a.doc_id, a.n_chars, a.quality
    FROM scored a
    WHERE NOT EXISTS (
      SELECT 1 FROM scored b
      WHERE b.n_chars >= a.n_chars AND b.quality >= a.quality
        AND (b.n_chars > a.n_chars OR b.quality > a.quality)
    )
    """,
)
def q_skyline(spark, sf_dir):
    """Decision support — skyline / Pareto frontier (Börzsönyi et al.
    2001): documents not dominated on (n_chars, quality) — no other doc
    is ≥ on both and > on one. Plan: the frontier candidates prune FIRST
    through a tiny broadcast — only rows at or above the per-quality-band
    max length can survive, so the quadratic dominance check runs on the
    pruned candidate set, never on all pairs (the window-free analog of
    a block-nested-loop skyline's pre-sort prune). Dominance itself is a
    broadcast anti-join: a row drops out when any strictly-dominating
    partner exists."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    quality = F.round(
        F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
        * F.lit(1.0)
        / F.greatest(F.length("text"), F.lit(1)),
        3,
    )
    scored = docs.select("doc_id", "n_chars", quality.alias("quality"))
    # prune: within each quality value, only the max-length rows can be
    # on the frontier; the surviving candidate set is tiny and broadcast
    per_q = scored.groupBy("quality").agg(F.max("n_chars").alias("max_len"))
    cand = (
        scored.join(F.broadcast(per_q), "quality")
        .filter(F.col("n_chars") == F.col("max_len"))
        .select("doc_id", "n_chars", "quality")
    )
    dom = cand.select(
        F.col("n_chars").alias("b_len"), F.col("quality").alias("b_q")
    )
    survivors = cand.join(
        F.broadcast(dom),
        (
            (F.col("b_len") >= F.col("n_chars"))
            & (F.col("b_q") >= F.col("quality"))
            & ((F.col("b_len") > F.col("n_chars")) | (F.col("b_q") > F.col("quality")))
        ),
        "left_anti",
    )
    return survivors.select("doc_id", "n_chars", "quality")


# ===========================================================================
# Largest-remainder apportionment
# ===========================================================================

_BUDGET = 100


@register(
    "q_apportion",
    f"""
    WITH g AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
    t AS (SELECT SUM(c) AS tot, COUNT(*) AS n_groups FROM g),
    q AS (
      SELECT lang, c,
             CAST({_BUDGET} AS DOUBLE) * c / tot AS quota,
             CAST(floor(CAST({_BUDGET} AS DOUBLE) * c / tot) AS BIGINT) AS base
      FROM g CROSS JOIN t
    ),
    r AS (
      SELECT lang, c, round(quota, 6) AS quota, base,
             ROW_NUMBER() OVER (
               ORDER BY quota - base DESC, lang
             ) AS rem_rank,
             {_BUDGET} - SUM(base) OVER () AS leftover
      FROM q
    )
    SELECT lang, c, quota, base,
           base + CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS alloc
    FROM r
    """,
)
def q_apportion(spark, sf_dir):
    """Sampling — largest-remainder (Hamilton) apportionment: split a
    {b}-doc sampling budget across languages EXACTLY proportionally —
    floor quotas, then the leftover seats go to the largest fractional
    remainders (lang tie-break). Σ alloc = budget always, the property
    rate-based sampling can't give you. Everything after the group-by
    runs on |langs| rows; windows are bounded by the dimension.""".format(
        b=_BUDGET
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    t = g.agg(F.sum("c").alias("tot"))
    q = g.crossJoin(F.broadcast(t)).select(
        "lang",
        "c",
        (F.lit(float(_BUDGET)) * F.col("c") / F.col("tot")).alias("quota"),
        F.floor(F.lit(float(_BUDGET)) * F.col("c") / F.col("tot"))
        .cast("long")
        .alias("base"),
    )
    w_all = Window.partitionBy()
    r = q.select(
        "lang",
        "c",
        F.round("quota", 6).alias("quota"),
        "base",
        F.row_number()
        .over(Window.orderBy((F.col("quota") - F.col("base")).desc(), "lang"))
        .alias("rem_rank"),
        (F.lit(_BUDGET) - F.sum("base").over(w_all)).alias("leftover"),
    )
    return r.select(
        "lang",
        "c",
        "quota",
        "base",
        (
            F.col("base")
            + F.when(F.col("rem_rank") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    )


# ===========================================================================
# Conversion latency percentiles
# ===========================================================================

@register(
    "q_conversion_latency",
    """
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
      FROM events GROUP BY 1
    ),
    lat AS (
      SELECT user_id % 2 AS arm, (p_us - v_us) / 3600000000.0 AS hours
      FROM firsts WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= v_us
    )
    SELECT arm, COUNT(*) AS n,
           round(quantile_cont(hours, 0.5), 6) AS p50_h,
           round(quantile_cont(hours, 0.9), 6) AS p90_h
    FROM lat GROUP BY arm
    """,
)
def q_conversion_latency(spark, sf_dir):
    """Funnel timing — first-view → first-purchase latency per user,
    summarized as p50/p90 hours per experiment arm (the timing
    companion of q_funnel_conversion and q_ab_test). One user-keyed agg
    collapses the stream to first-touch timestamps (integer µs — exact),
    the latency filter is narrow, and the percentile agg runs on
    |arms| = 2 bounded groups."""
    ev = read_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("v_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("p_us"),
    )
    lat = firsts.filter(
        F.col("v_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") >= F.col("v_us"))
    ).select(
        (F.col("user_id") % 2).alias("arm"),
        ((F.col("p_us") - F.col("v_us")) / F.lit(3600000000.0)).alias("hours"),
    )
    return lat.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(hours, 0.5)"), 6).alias("p50_h"),
        F.round(F.expr("percentile(hours, 0.9)"), 6).alias("p90_h"),
    )
