"""Round-2 registry additions, batch 12 — runtime-filter and
semantic-dedup primitives plus event-attribution joins:

- q_bloom_decontam: relational Bloom filter as a runtime prefilter in
  front of the exact decontamination join (result stays EXACT — the
  bloom only prunes);
- q_semantic_dedup: SemDeDup-style centroid-sharded embedding dedup
  (public method, Abbas et al. 2023);
- q_time_decay: exponentially time-decayed per-user activity score;
- q_inactive_customers: anti-join referential audit;
- q_view_purchase_attribution: last-touch attribution within a 24 h
  lookback — the batch form of a stream-stream interval join
  (streaming/joins.py runs the same semantics with watermarks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import bloomfilter, centroids
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs, _emb
from arrow_supercluster_spark.plans.registry_ext9 import (
    _EVAL_MOD,
    _NGRAM,
    _SQL_GRAMS,
)
from arrow_supercluster_spark.sources.tables import read_events, read_table


# ===========================================================================
# Bloom-prefiltered decontamination (exact result, bloom-pruned plan)
# ===========================================================================

@register(
    "q_bloom_decontam",
    f"""
    WITH grams AS ({_SQL_GRAMS}),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0
    )
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.doc_id % {_EVAL_MOD} <> 0
      AND NOT EXISTS (
        SELECT 1 FROM grams t JOIN eval_grams e USING (g)
        WHERE t.doc_id = d.doc_id)
    """,
)
def q_bloom_decontam(spark, sf_dir):
    """Pipeline — the CLEAN training set (docs sharing no word-8-gram
    with the eval slice), computed through a relational Bloom filter:
    eval grams -> fixed-size bitmap (2^20 bits = 128 KB, broadcast; size the bitmap for the EXPECTED eval-set cardinality - a saturated bloom is correct but stops pruning) -> narrow
    probe of the train grams -> exact semi-join verify over the few
    survivors -> anti-join. Equivalent to the plain exact anti-join (the
    oracle's NOT EXISTS) because bloom filters have no false negatives
    and the survivors are exactly re-verified; the payoff at 100 TB is
    that the corpus-gram side crosses NO shuffle for the prefilter and
    the exact join sees only bloom survivors instead of every gram.
    tests/test_batch12b.py checks the no-false-negative superset property
    and the candidate reduction directly."""
    return bloomfilter.bloom_decontaminate(
        _docs(spark, sf_dir),
        eval_pred=F.col("doc_id") % _EVAL_MOD == 0,
        n=_NGRAM,
    )


# ===========================================================================
# SemDeDup-style semantic dedup over embeddings
# ===========================================================================

_SD_K = 8
_SD_TAU = 0.9

# DuckDB twin of centroids.seed_assign (same CTE shape as q_kmeans_step)
_SQL_ASSIGN = f"""
    vec AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cid, v AS c FROM vec WHERE vec_id < {_SD_K}
    ),
    dists AS (
      SELECT vec.vec_id, seeds.cid,
             round(list_sum(list_transform(
               range(1, len(vec.v) + 1),
               j -> (vec.v[j] - seeds.c[j]) * (vec.v[j] - seeds.c[j])
             )), 6) AS d2
      FROM vec CROSS JOIN seeds
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2, cid) AS rk
        FROM dists
      ) WHERE rk = 1
    )
"""

_SQL_COS = """
    round(CASE WHEN sqrt(list_inner_product(va.v, va.v))
                    * sqrt(list_inner_product(vb.v, vb.v)) = 0
               THEN 0.0
               ELSE list_inner_product(va.v, vb.v)
                    / (sqrt(list_inner_product(va.v, va.v))
                       * sqrt(list_inner_product(vb.v, vb.v))) END, 6)
"""


@register(
    "q_semantic_dedup",
    f"""
    WITH {_SQL_ASSIGN},
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assign a JOIN assign b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      JOIN vec va ON va.vec_id = a.vec_id
      JOIN vec vb ON vb.vec_id = b.vec_id
      WHERE {_SQL_COS} >= {_SD_TAU}
    )
    SELECT a.vec_id, a.cid FROM assign a
    WHERE NOT EXISTS (SELECT 1 FROM dropped d WHERE d.vec_id = a.vec_id)
    """,
)
def q_semantic_dedup(spark, sf_dir):
    """E2/E3 composition — SemDeDup semantic dedup: embeddings sharded
    into {k} centroid cells (deterministic seeds, narrow literal-shipped
    argmin), a vector dropped iff a LOWER-id near-twin (cos >= 0.9)
    exists in its own cell. The quadratic pair term is confined within
    cells — the published method's scaling argument — and the drop rule
    is order-free, so the oracle can restate it as a NOT EXISTS."""
    return centroids.semantic_dedup(_emb(spark, sf_dir), k=_SD_K, tau=_SD_TAU)


# ===========================================================================
# Exponential time-decay scoring
# ===========================================================================

_ANCHOR = "2024-02-01"
_HALF_DAYS = 7.0


@register(
    "q_time_decay",
    f"""
    SELECT user_id,
           round(SUM(value * exp(-((epoch_us(TIMESTAMP '{_ANCHOR}')
                                    - epoch_us(ts)) / 86400000000.0)
                                 / {_HALF_DAYS})), 4) AS score,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def q_time_decay(spark, sf_dir):
    """Event analytics — exponentially time-decayed per-user activity
    score (recency-weighted engagement, the standard freshness feature):
    score = sum(value * exp(-age_days / 7)) against a fixed anchor
    date. Narrow map + ONE user-keyed agg with map-side combine; the
    anchor is a literal so no extra pass over the data computes max(ts).
    Rounded to 4 decimals so summation-order float drift can't reach
    the hash."""
    ev = read_events(spark, sf_dir)
    anchor_us = F.unix_micros(F.to_timestamp(F.lit(_ANCHOR)))
    age_days = (anchor_us - F.unix_micros(F.col("ts"))) / F.lit(86400000000.0)
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value") * F.exp(-age_days / F.lit(_HALF_DAYS))), 4
            ).alias("score"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ===========================================================================
# Anti-join referential audit
# ===========================================================================

@register(
    "q_inactive_customers",
    """
    SELECT c_custkey, c_nationkey FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
)
def q_inactive_customers(spark, sf_dir):
    """Relational substrate — LEFT ANTI join (the one join type the
    earlier batches didn't exercise): customers with no event activity.
    The distinct-user build side is bounded by the active-user count and
    aggregates map-side before the join; AQE picks broadcast when it
    fits. At 100 TB this is the canonical 'audit' shape: scan the big
    side once, never materialize the pair space."""
    cust = read_table(spark, sf_dir, "customer")
    users = read_events(spark, sf_dir).select("user_id").distinct()
    return (
        cust.join(users, cust["c_custkey"] == users["user_id"], "left_anti")
        .select("c_custkey", "c_nationkey")
    )


# ===========================================================================
# Last-touch attribution (batch form of a stream-stream interval join)
# ===========================================================================

_ATTR_WINDOW_US = 24 * 3600 * 1_000_000


@register(
    "q_view_purchase_attribution",
    f"""
    SELECT purchase_id, user_id, view_id FROM (
      SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY epoch_us(v.ts) DESC, v.event_id DESC) AS rk
      FROM events p JOIN events v
        ON v.user_id = p.user_id AND v.event_type = 'view'
       AND epoch_us(v.ts) <= epoch_us(p.ts)
       AND epoch_us(v.ts) >= epoch_us(p.ts) - {_ATTR_WINDOW_US}
      WHERE p.event_type = 'purchase'
    ) WHERE rk = 1
    """,
)
def q_view_purchase_attribution(spark, sf_dir):
    """Event analytics — LAST-TOUCH attribution: each purchase matched
    to the latest 'view' by the same user within a 24 h lookback
    (ties -> highest view id). The join is user-keyed (equi) with the
    time bound as a residual predicate — the exact batch twin of a
    Structured Streaming stream-stream interval join (streaming/joins.py
    runs the same condition with watermarks; at 100 TB the streaming
    form bounds state to the 24 h window per user). The best-view pick
    is a max(struct) agg keyed by purchase — no window over an
    unbounded partition."""
    ev = read_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("v_us"),
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_us") <= F.col("p_us"))
        & (F.col("v_us") >= F.col("p_us") - F.lit(_ATTR_WINDOW_US)),
    )
    return (
        joined.groupBy("purchase_id", "user_id")
        .agg(F.max(F.struct("v_us", "view_id")).alias("w"))
        .select("purchase_id", "user_id", F.col("w.view_id").alias("view_id"))
    )
