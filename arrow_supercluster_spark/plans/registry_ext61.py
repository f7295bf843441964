"""Round-2 registry additions, batch 56 — warehouse-wide integrity and
fold stability:

- q_fk_audit: orphan counts for every foreign-key edge in the star
  schema (lineitem→orders, orders→customer, customer→nation,
  nation→region, supplier→nation, lineitem→part) in one report;
- q_fold_stability: per-fold mean/std of user spend under the
  deterministic 5-fold split — the cheap sanity check that folds are
  exchangeable before any cross-validation is trusted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import pipeline
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events, read_table

_FKS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _sql_fk_one(child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{child}.{ck}' AS fk, '{parent}.{pk}' AS references_,
           (SELECT COUNT(*) FROM {child}) AS n_child,
           (SELECT COUNT(*) FROM {child} c
            LEFT JOIN {parent} p ON p.{pk} = c.{ck}
            WHERE p.{pk} IS NULL) AS n_orphans
    """


@register(
    "q_fk_audit",
    " UNION ALL ".join(_sql_fk_one(*fk) for fk in _FKS),
)
def q_fk_audit(spark, sf_dir):
    """Integrity — the warehouse-wide FOREIGN-KEY audit: orphan counts
    for all seven FK edges of the star schema in one report (the
    q_data_quality single-pair check promoted to the full graph —
    orphans mean inner joins silently drop rows and every revenue
    number downstream is wrong). Each edge is a left-anti count with
    the parent's KEY COLUMN only on the build side (broadcastable
    however wide the parent's rows are)."""
    outs = []
    for child, ck, parent, pk in _FKS:
        c = read_table(spark, sf_dir, child)
        p = read_table(spark, sf_dir, parent).select(pk)
        n_child = c.count()
        n_orphans = c.join(
            F.broadcast(p), c[ck] == p[pk], "left_anti"
        ).count()
        outs.append((f"{child}.{ck}", f"{parent}.{pk}", n_child, n_orphans))
    return spark.createDataFrame(
        outs, "fk string, references_ string, n_child long, n_orphans long"
    )


_N_FOLDS = 5


@register(
    "q_fold_stability",
    f"""
    WITH per_user AS (
      SELECT user_id, round(SUM(value), 4) AS spend
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    folded AS (
      SELECT ((user_id * {pipeline.HASH_MULT}) % {pipeline.HASH_MOD})
               % {_N_FOLDS} AS fold,
             spend
      FROM per_user
    )
    SELECT fold, COUNT(*) AS n,
           round(AVG(spend), 6) AS mean_spend,
           round(stddev_samp(spend), 6) AS sd_spend
    FROM folded GROUP BY fold
    """,
)
def q_fold_stability(spark, sf_dir):
    """Validation — fold exchangeability: per-fold mean/std of user
    spend under the deterministic 5-fold hash split (q_holdout_split's
    CV sibling). Wildly different fold means ⇒ the split correlates
    with the target and every cross-validated metric is biased — the
    30-second check before trusting any CV number. One user collapse +
    a 5-row agg."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("spend")
    )
    fold = (
        (F.col("user_id") * pipeline.HASH_MULT) % pipeline.HASH_MOD
    ) % _N_FOLDS
    return (
        per_user.select(fold.alias("fold"), "spend")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("spend"), 6).alias("mean_spend"),
            F.round(F.stddev_samp("spend"), 6).alias("sd_spend"),
        )
    )
