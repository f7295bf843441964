"""Data-quality constraint auditing (Deequ-style, public method:
Schelter et al. 2018, "Automating Large-Scale Data Quality
Verification") and incremental-aggregate maintenance.

Scale notes (100 TB):
- quality_metrics computes every row-level metric in ONE pass over the
  fact table (a single aggregate with map-side combine); the
  distinct-key and referential metrics each add one key-only
  aggregation/join — keys, never payloads, cross the shuffle;
- merge_partials is the associative-merge algebra (count/sum/min/max
  partial states) that lets a pipeline maintain a materialized
  aggregate by merging yesterday's state with today's increment
  instead of recomputing the corpus — the incremental-view-maintenance
  pattern every warehouse relies on. q_incremental_agg differentially
  proves merge(old, new) == full recompute.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def quality_metrics(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Long-format (metric, value) constraint audit over lineitem:
    row count, key uniqueness, null completeness, range compliance,
    and referential (foreign-key) coverage vs orders. Fractions rounded
    to 6 decimals."""
    base = lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.sum(F.col("l_returnflag").isNull().cast("long")).alias("null_rf"),
        F.sum(
            (F.col("l_quantity").between(1.0, 50.0)).cast("long")
        ).alias("qty_in_range"),
        F.sum(
            (F.col("l_discount").between(0.0, 0.1)).cast("long")
        ).alias("disc_in_range"),
    )
    uniq = lineitem.select("l_orderkey", "l_linenumber").distinct().agg(
        F.count(F.lit(1)).alias("n_distinct_keys")
    )
    fk = lineitem.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "leftsemi",
    ).agg(F.count(F.lit(1)).alias("n_fk_matched"))

    j = base.crossJoin(uniq).crossJoin(fk)
    n = F.col("n_rows").cast("double")
    metrics = [
        ("row_count", F.col("n_rows").cast("double")),
        ("completeness_l_quantity", F.round(1.0 - F.col("null_qty") / n, 6)),
        ("completeness_l_returnflag", F.round(1.0 - F.col("null_rf") / n, 6)),
        ("uniqueness_orderkey_linenumber", F.round(F.col("n_distinct_keys") / n, 6)),
        ("compliance_quantity_1_50", F.round(F.col("qty_in_range") / n, 6)),
        ("compliance_discount_0_01", F.round(F.col("disc_in_range") / n, 6)),
        ("fk_coverage_orders", F.round(F.col("n_fk_matched") / n, 6)),
    ]
    rows = [
        j.select(F.lit(name).alias("metric"), expr.alias("value"))
        for name, expr in metrics
    ]
    return reduce(DataFrame.unionAll, rows)


SQL_QUALITY_METRICS = """
    WITH base AS (
      SELECT COUNT(*) AS n_rows,
             SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS null_qty,
             SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS null_rf,
             SUM(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0
                      THEN 1 ELSE 0 END) AS qty_in_range,
             SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1
                      THEN 1 ELSE 0 END) AS disc_in_range
      FROM lineitem
    ),
    uniq AS (
      SELECT COUNT(*) AS n_distinct_keys FROM (
        SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)
    ),
    fk AS (
      SELECT COUNT(*) AS n_fk_matched FROM lineitem l
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    ),
    j AS (SELECT * FROM base, uniq, fk)
    SELECT 'row_count' AS metric, CAST(n_rows AS DOUBLE) AS value FROM j
    UNION ALL SELECT 'completeness_l_quantity',
      round(1.0 - null_qty / CAST(n_rows AS DOUBLE), 6) FROM j
    UNION ALL SELECT 'completeness_l_returnflag',
      round(1.0 - null_rf / CAST(n_rows AS DOUBLE), 6) FROM j
    UNION ALL SELECT 'uniqueness_orderkey_linenumber',
      round(n_distinct_keys / CAST(n_rows AS DOUBLE), 6) FROM j
    UNION ALL SELECT 'compliance_quantity_1_50',
      round(qty_in_range / CAST(n_rows AS DOUBLE), 6) FROM j
    UNION ALL SELECT 'compliance_discount_0_01',
      round(disc_in_range / CAST(n_rows AS DOUBLE), 6) FROM j
    UNION ALL SELECT 'fk_coverage_orders',
      round(n_fk_matched / CAST(n_rows AS DOUBLE), 6) FROM j
"""


def partial_user_stats(events: DataFrame) -> DataFrame:
    """Mergeable partial-aggregate state per user: (user_id, cnt,
    sum_v, min_v, max_v). The state is ASSOCIATIVE — merging two
    partials with merge_partials gives the same state as aggregating
    the union."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


def merge_partials(*parts: DataFrame) -> DataFrame:
    """Merge partial user states: counts/sums add, mins/maxs fold.
    This is the incremental-maintenance step: state(old ∪ new) =
    merge(state(old), state(new)) without touching old rows again."""
    unioned = reduce(DataFrame.unionAll, parts)
    return unioned.groupBy("user_id").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
