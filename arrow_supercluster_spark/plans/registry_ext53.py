"""Round-2 registry additions, batch 48 — feature-store assembly and
shard manifests:

- q_user_features: the per-user FEATURE VECTOR (recency, frequency,
  monetary, behavioral entropy, lifetime, purchase flag) assembled in
  one pass — the feature-store build every churn/LTV model trains on;
- q_shard_manifest: training-shard manifest with per-shard document
  counts, token totals, id ranges, and an md5 content-listing checksum
  — the artifact a dataloader actually consumes.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators.dedup import tokenize
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# User feature vector
# ===========================================================================

_FEAT_ANCHOR = "2024-02-01"


@register(
    "q_user_features",
    f"""
    WITH base AS (
      SELECT user_id,
             COUNT(*) AS frequency,
             round(SUM(value), 4) AS monetary,
             CAST((epoch_us(TIMESTAMP '{_FEAT_ANCHOR}') - MAX(epoch_us(ts)))
                  // 86400000000 AS BIGINT) AS recency_days,
             CAST(floor((MAX(epoch_us(ts)) - MIN(epoch_us(ts)))
                        / 86400000000.0) AS BIGINT) AS lifetime_days,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS has_purchased
      FROM events GROUP BY 1
    ),
    mix AS (
      SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
    ),
    ent AS (
      SELECT m.user_id,
             round(-SUM((c * 1.0 / b.frequency) * ln(c * 1.0 / b.frequency)), 6)
               AS entropy
      FROM mix m JOIN base b USING (user_id)
      GROUP BY m.user_id
    )
    SELECT b.user_id, b.frequency, b.monetary, b.recency_days,
           b.lifetime_days, b.has_purchased, e.entropy
    FROM base b JOIN ent e USING (user_id)
    """,
)
def q_user_features(spark, sf_dir):
    """Feature store — the assembled per-user feature vector: frequency,
    monetary, recency (vs a fixed anchor), lifetime, purchase flag, and
    behavioral entropy, in ONE wide row per user — the training-table
    build behind churn/LTV models, and the reuse point for
    q_rfm_segments / q_user_entropy / q_kaplan_meier's inputs. Two
    user-keyed aggs (base stats + type mix) and a user-keyed join —
    the stream shuffles twice on the same key (AQE coalesces), nothing
    else moves."""
    ev = read_events(spark, sf_dir)
    anchor_us = F.unix_micros(F.to_timestamp(F.lit(_FEAT_ANCHOR)))
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 4).alias("monetary"),
        ((anchor_us - F.max(F.unix_micros("ts"))) / F.lit(86400000000))
        .cast("long")
        .alias("recency_days"),
        F.floor(
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
            / 86400000000.0
        )
        .cast("long")
        .alias("lifetime_days"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchased"),
    )
    mix = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c") * 1.0 / F.col("frequency")
    ent = (
        mix.join(base.select("user_id", "frequency"), "user_id")
        .groupBy("user_id")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )
    return base.join(ent, "user_id").select(
        "user_id", "frequency", "monetary", "recency_days",
        "lifetime_days", "has_purchased", "entropy",
    )


# ===========================================================================
# Shard manifest
# ===========================================================================

_SHARD_TOKENS = 20_000


@register(
    "q_shard_manifest",
    f"""
    WITH t AS (
      SELECT doc_id, CAST(len({SQL_TOKS}) AS BIGINT) AS n_toks FROM documents
    ),
    c AS (
      SELECT doc_id, n_toks,
             CAST(coalesce(SUM(n_toks) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS off
      FROM t
    ),
    sharded AS (
      SELECT doc_id, n_toks, off // {_SHARD_TOKENS} AS shard_id FROM c
    )
    SELECT shard_id,
           COUNT(*) AS n_docs,
           SUM(n_toks) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS content_md5
    FROM sharded GROUP BY shard_id
    """,
)
def q_shard_manifest(spark, sf_dir):
    """Pipeline — the training-shard MANIFEST: docs packed into
    ~{n}-token shards by global offset (q_concat_chunks' distributed
    prefix sum), each shard reporting doc count, token total, id range,
    and an md5 over its ordered id listing — the integrity artifact a
    dataloader checks before streaming a shard. The checksum input is
    the sorted id list (deterministic on both engines via ordered
    aggregation); everything downstream of the prefix sum is a
    |shards|-row table.""".format(n=_SHARD_TOKENS)
    from arrow_supercluster_spark.functions.prefix import global_prefix_sum

    docs = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_toks")
    )
    c = global_prefix_sum(t, "doc_id", "n_toks", out="off")
    sharded = c.select(
        "doc_id", "n_toks", F.expr(f"off div {_SHARD_TOKENS}").alias("shard_id")
    )
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).cast("binary")
        ).alias("content_md5"),
    )
