"""Round-2 registry additions, batch 49 — ML feature preparation:

- q_impute_values: per-type mean imputation of null event values with
  an audit trail (imputed counts per type);
- q_target_encoding: LEAVE-ONE-OUT target encoding of market segment
  against order value — the leakage-safe categorical encoder;
- q_woe_iv: weight-of-evidence / information value of the spend
  deciles against the purchase flag — the credit-scoring feature
  screen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events, read_table

# ===========================================================================
# Imputation
# ===========================================================================

@register(
    "q_impute_values",
    """
    WITH stats AS (
      SELECT event_type, round(AVG(value), 6) AS mean_v
      FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT e.event_type,
           COUNT(*) AS n_rows,
           SUM(CASE WHEN e.value IS NULL THEN 1 ELSE 0 END) AS n_imputed,
           round(SUM(coalesce(e.value, s.mean_v)), 4) AS sum_imputed,
           round(ANY_VALUE(s.mean_v), 6) AS fill_value
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_impute_values(spark, sf_dir):
    """ML prep — per-type MEAN IMPUTATION of null event values with the
    audit a governed pipeline requires: how many rows were filled, with
    what, and the post-imputation sum (silent imputation is how
    training bugs ship). One tiny per-type stats agg broadcast back
    onto the scan; the imputation itself is a coalesce — narrow."""
    ev = read_events(spark, sf_dir)
    stats = ev.filter(F.col("value").isNotNull()).groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_v")
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").isNull().cast("int")).alias("n_imputed"),
            F.round(F.sum(F.coalesce("value", "mean_v")), 4).alias("sum_imputed"),
            F.round(F.first("mean_v"), 6).alias("fill_value"),
        )
    )


# ===========================================================================
# Leave-one-out target encoding
# ===========================================================================

@register(
    "q_target_encoding",
    """
    WITH joined AS (
      SELECT o.o_orderkey, c.c_mktsegment AS seg, o.o_totalprice AS y
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
      SELECT seg, SUM(y) AS sum_y, COUNT(*) AS n FROM joined GROUP BY 1
    )
    SELECT j.o_orderkey, j.seg,
           CASE WHEN g.n > 1
                THEN round((g.sum_y - j.y) / (g.n - 1), 4)
                ELSE NULL END AS loo_encoding
    FROM joined j JOIN g USING (seg)
    """,
)
def q_target_encoding(spark, sf_dir):
    """ML prep — LEAVE-ONE-OUT target encoding: each order's market
    segment encoded as the mean order value of the OTHER orders in its
    segment, (Σy − y)/(n−1) — the leakage-safe categorical encoder (a
    naive group mean leaks each row's own target into its feature).
    One |segments|-row agg broadcast back; the encode is a narrow
    projection. Singleton groups yield NULL (no peers to average)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("y"),
    )
    g = joined.groupBy("seg").agg(
        F.sum("y").alias("sum_y"), F.count(F.lit(1)).alias("n")
    )
    return joined.join(F.broadcast(g), "seg").select(
        "o_orderkey", "seg",
        F.when(
            F.col("n") > 1,
            F.round((F.col("sum_y") - F.col("y")) / (F.col("n") - 1), 4),
        ).alias("loo_encoding"),
    )


# ===========================================================================
# Weight of evidence / information value
# ===========================================================================

_WOE_PS = [i / 5 for i in range(1, 5)]  # quintiles


@register(
    "q_woe_iv",
    f"""
    WITH per_user AS (
      SELECT user_id, round(SUM(value), 4) AS spend,
             MAX(CASE WHEN event_type = 'purchase' AND value > 90
                      THEN 1 ELSE 0 END) AS label
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    cuts AS (
      SELECT {", ".join(f"round(quantile_cont(spend, {p}), 6) AS c{i}" for i, p in enumerate(_WOE_PS))}
      FROM per_user
    ),
    binned AS (
      SELECT label,
             1 {"".join(f" + CAST(spend > c{i} AS INTEGER)" for i in range(len(_WOE_PS)))}
               AS bucket
      FROM per_user CROSS JOIN cuts
    ),
    counts AS (
      SELECT bucket,
             SUM(label) AS n_pos,
             SUM(1 - label) AS n_neg
      FROM binned GROUP BY bucket
    ),
    tot AS (SELECT SUM(n_pos) AS tp, SUM(n_neg) AS tn FROM counts)
    SELECT bucket, n_pos, n_neg,
           round(ln((n_pos * 1.0 / tp) / (n_neg * 1.0 / tn)), 6) AS woe,
           round((n_pos * 1.0 / tp - n_neg * 1.0 / tn)
                 * ln((n_pos * 1.0 / tp) / (n_neg * 1.0 / tn)), 9) AS iv_term
    FROM counts CROSS JOIN tot
    WHERE n_pos > 0 AND n_neg > 0
    """,
)
def q_woe_iv(spark, sf_dir):
    """ML prep — weight of evidence + information value of per-user
    spend quintiles against the high-value-purchase label: WoE =
    ln(share_pos/share_neg) per bucket, IV = Σ (Δshare)·WoE — the
    credit-scoring feature screen (IV < 0.02 useless, > 0.3 strong).
    Quintile cuts come from one percentile agg (broadcast), the label
    and binning are narrow, counts collapse to 5 rows. Zero-count
    buckets drop (standard; smoothing is a caller knob)."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("spend"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") > 90), 1
            ).otherwise(0)
        ).alias("label"),
    )
    cuts = per_user.agg(
        *[
            F.round(F.expr(f"percentile(spend, {p})"), 6).alias(f"c{i}")
            for i, p in enumerate(_WOE_PS)
        ]
    )
    bucket = F.lit(1)
    for i in range(len(_WOE_PS)):
        bucket = bucket + (F.col("spend") > F.col(f"c{i}")).cast("int")
    binned = per_user.crossJoin(F.broadcast(cuts)).select(
        "label", bucket.alias("bucket")
    )
    counts = binned.groupBy("bucket").agg(
        F.sum("label").alias("n_pos"),
        F.sum(1 - F.col("label")).alias("n_neg"),
    )
    tot = counts.agg(F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn"))
    sp = F.col("n_pos") * 1.0 / F.col("tp")
    sn = F.col("n_neg") * 1.0 / F.col("tn")
    return (
        counts.crossJoin(F.broadcast(tot))
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(
            "bucket", "n_pos", "n_neg",
            F.round(F.log(sp / sn), 6).alias("woe"),
            F.round((sp - sn) * F.log(sp / sn), 9).alias("iv_term"),
        )
    )
