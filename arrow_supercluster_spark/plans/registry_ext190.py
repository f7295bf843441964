"""Round-7 registry additions, batch 185 — the nightly data-contract
audit: one frame, every table's invariants.

- q_data_contract: six Great-Expectations-style rules evaluated in a
  single result (table, rule, n_checked, n_violations, passed):
  referential integrity orders→customer and lineitem→orders (anti-join
  orphan counts), documents.doc_id uniqueness, events.value range
  [0, 1000), documents.text non-empty, and events.ts freshness inside
  the stated calendar window.  THE gate a pipeline evaluates before
  promoting a batch; failures page, passes promote.

At 100 TB: each rule is one partial-aggregated pass or one
broadcast/shuffle anti-join on its key; the six rules union into a
6-row frame.  No windows, no collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.sources.tables import read_events

_DC_VALUE_LO, _DC_VALUE_HI = 0.0, 1000.0
_DC_TS_LO, _DC_TS_HI = "2024-01-01", "2024-03-01"


@register(
    "q_data_contract",
    f"""
    WITH r1 AS (
      SELECT 'orders' AS tbl, 'fk_custkey' AS rule,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_violations
      FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    r2 AS (
      SELECT 'lineitem', 'fk_orderkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM lineitem l LEFT JOIN orders o
        ON o.o_orderkey = l.l_orderkey
    ),
    r3 AS (
      SELECT 'documents', 'unique_doc_id',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT)
      FROM documents
    ),
    r4 AS (
      SELECT 'events', 'value_in_range',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN value < {_DC_VALUE_LO}
                            OR value >= {_DC_VALUE_HI}
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
    ),
    r5 AS (
      SELECT 'documents', 'text_nonempty',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN text IS NULL OR length(trim(text)) = 0
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM documents
    ),
    r6 AS (
      SELECT 'events', 'ts_fresh_window',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{_DC_TS_LO}'
                            OR CAST(ts AS DATE) >= DATE '{_DC_TS_HI}'
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM events
    ),
    allr AS (
      SELECT * FROM r1 UNION ALL SELECT * FROM r2
      UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
      UNION ALL SELECT * FROM r5 UNION ALL SELECT * FROM r6
    )
    SELECT tbl, rule, n_checked, n_violations,
           n_violations = 0 AS passed
    FROM allr ORDER BY tbl, rule
    """,
)
def q_data_contract(spark, sf_dir):
    """R553 — the nightly contract audit: six invariants over four
    tables in one 6-row frame (referential integrity ×2, key
    uniqueness, value range, non-empty text, timestamp freshness).
    Each rule is a single partial-aggregated pass or a key-equi
    anti-count; `passed` is the promote/page bit."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = _docs(spark, sf_dir)
    ev = read_events(spark, sf_dir)

    def rule(tbl, name, df, viol_col):
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(viol_col).alias("n_violations"),
        )

    r1 = rule(
        "orders", "fk_custkey",
        orders.join(
            customer.select("c_custkey"),
            orders.o_custkey == customer.c_custkey, "left",
        ),
        F.when(F.col("c_custkey").isNull(), 1).otherwise(0),
    )
    r2 = rule(
        "lineitem", "fk_orderkey",
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == orders.o_orderkey, "left",
        ),
        F.when(F.col("o_orderkey").isNull(), 1).otherwise(0),
    )
    r3 = docs.agg(
        F.lit("documents").alias("tbl"),
        F.lit("unique_doc_id").alias("rule"),
        F.count(F.lit(1)).alias("n_checked"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias(
            "n_violations"
        ),
    )
    r4 = rule(
        "events", "value_in_range", ev,
        F.when(
            (F.col("value") < _DC_VALUE_LO)
            | (F.col("value") >= _DC_VALUE_HI),
            1,
        ).otherwise(0),
    )
    r5 = rule(
        "documents", "text_nonempty", docs,
        F.when(
            F.col("text").isNull() | (F.length(F.trim("text")) == 0), 1
        ).otherwise(0),
    )
    r6 = rule(
        "events", "ts_fresh_window", ev,
        F.when(
            (F.to_date("ts") < F.lit(_DC_TS_LO).cast("date"))
            | (F.to_date("ts") >= F.lit(_DC_TS_HI).cast("date")),
            1,
        ).otherwise(0),
    )
    allr = r1.unionByName(r2).unionByName(r3).unionByName(r4) \
             .unionByName(r5).unionByName(r6)
    return allr.select(
        "tbl", "rule", "n_checked", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("tbl", "rule")
