"""Round-2 registry additions, batch 74 — retail operations over the
TPC-H fact tables:

- q_return_rates: return rate and revenue-at-risk per part brand;
- q_ship_lead_time: order→ship lead-time percentiles per order
  priority — does priority actually buy speed?
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_table


@register(
    "q_return_rates",
    """
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_returned,
           round(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS return_rate,
           round(SUM(CASE WHEN l.l_returnflag = 'R'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END), 4) AS revenue_at_risk
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
)
def q_return_rates(spark, sf_dir):
    """Retail ops — return rate and returned revenue per brand: the
    quality/liability dashboard row (a brand with 2× the return rate is
    a sourcing problem; the revenue-at-risk column prices it). One
    broadcast dim join + one |brands|-keyed agg with conditional
    sums."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    returned = (F.col("l_returnflag") == "R").cast("int")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(returned).alias("n_returned"),
            F.round(F.sum(returned) * 1.0 / F.count(F.lit(1)), 6).alias(
                "return_rate"
            ),
            F.round(
                F.sum(
                    F.when(
                        F.col("l_returnflag") == "R",
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                    ).otherwise(0.0)
                ),
                4,
            ).alias("revenue_at_risk"),
        )
    )


@register(
    "q_ship_lead_time",
    """
    WITH lead AS (
      SELECT o.o_orderpriority AS priority,
             CAST(floor((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                        / 86400000000.0) AS BIGINT) AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT priority,
           COUNT(*) AS n,
           round(quantile_cont(lead_days, 0.5), 6) AS p50_days,
           round(quantile_cont(lead_days, 0.9), 6) AS p90_days,
           MAX(lead_days) AS max_days
    FROM lead GROUP BY priority
    """,
)
def q_ship_lead_time(spark, sf_dir):
    """Retail ops — order→ship lead time per priority class: the SLA
    readout that answers 'does 1-URGENT actually ship faster' (in
    TPC-H-style data it usually doesn't — priorities are labels, not
    process). Integer-day arithmetic in µs (NTZ parquet dates cast to instant
    under the UTC session — the read_events discipline); one orderkey join + a
    |priorities|-bounded percentile agg."""
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lead = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.floor(
                (F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                - F.unix_micros(F.col("o_orderdate").cast("timestamp")))
                / 86400000000.0
            )
            .cast("long")
            .alias("lead_days"),
        )
    )
    return lead.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(lead_days, 0.5)"), 6).alias("p50_days"),
        F.round(F.expr("percentile(lead_days, 0.9)"), 6).alias("p90_days"),
        F.max("lead_days").alias("max_days"),
    )
