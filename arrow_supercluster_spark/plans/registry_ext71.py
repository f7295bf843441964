"""Round-2 registry additions, batch 66 — hazard rates and effective
diversity:

- q_hazard_rate: the discrete churn hazard h(t) = deaths(t)/at-risk(t)
  per lifetime day — the derivative view of q_kaplan_meier's survival
  curve;
- q_effective_counts: exp(Shannon entropy) effective numbers of
  sources and languages — 'how many sources does this corpus
  EFFECTIVELY have' (20 listed, fewer if skewed).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_HZ_CHURN_DAYS = 7


@register(
    "q_hazard_rate",
    f"""
    WITH horizon AS (SELECT MAX(epoch_us(ts)) AS h_us FROM events),
    lifetimes AS (
      SELECT user_id,
             CAST(floor((MAX(epoch_us(ts)) - MIN(epoch_us(ts)))
                        / 86400000000.0) AS BIGINT) AS t_days,
             CAST(MAX(epoch_us(ts))
                  < (SELECT h_us FROM horizon)
                    - {_HZ_CHURN_DAYS} * 86400000000
                  AS INTEGER) AS died
      FROM events GROUP BY user_id
    ),
    risk AS (
      SELECT t_days,
             CAST(SUM(died) AS BIGINT) AS d,
             COUNT(*) AS leaving,
             CAST(SUM(COUNT(*)) OVER (ORDER BY t_days DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS at_risk
      FROM lifetimes GROUP BY t_days
    )
    SELECT t_days, d, at_risk,
           round(d * 1.0 / at_risk, 6) AS hazard
    FROM risk WHERE d > 0
    """,
)
def q_hazard_rate(spark, sf_dir):
    """Survival — the discrete HAZARD series: conditional churn
    probability h(t) = deaths(t)/at-risk(t) per lifetime day (only
    days with deaths — the hazard's support), the derivative view of
    q_kaplan_meier's Ŝ(t) = Π(1 − h): a hazard spike at day t is a
    churn cliff the curve only shows as a slope change. Same lifetime
    collapse + reverse cumulative window."""
    ev = read_events(spark, sf_dir)
    horizon = ev.agg(F.max(F.unix_micros("ts")).alias("h_us"))
    lt = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.floor((F.col("hi") - F.col("lo")) / 86400000000.0)
            .cast("long")
            .alias("t_days"),
            (
                F.col("hi") < F.col("h_us") - _HZ_CHURN_DAYS * 86400000000
            ).cast("int").alias("died"),
        )
    )
    risk = lt.groupBy("t_days").agg(
        F.sum("died").cast("long").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_desc = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = risk.select(
        "t_days", "d", F.sum("leaving").over(w_desc).cast("long").alias("at_risk")
    )
    return risk.filter(F.col("d") > 0).select(
        "t_days", "d", "at_risk",
        F.round(F.col("d") * 1.0 / F.col("at_risk"), 6).alias("hazard"),
    )


def _sql_effective(col: str) -> str:
    return f"""
    SELECT '{col}' AS dimension,
           COUNT(*) AS n_listed,
           round(exp(-SUM((c * 1.0 / t) * ln(c * 1.0 / t))), 6) AS n_effective
    FROM (
      SELECT {col}, COUNT(*) AS c,
             SUM(COUNT(*)) OVER () AS t
      FROM documents GROUP BY {col}
    ) g
    """


@register(
    "q_effective_counts",
    _sql_effective("source") + " UNION ALL " + _sql_effective("lang"),
)
def q_effective_counts(spark, sf_dir):
    """Diversity — EFFECTIVE numbers (Hill number of order 1,
    exp(Shannon)): how many sources/languages the corpus effectively
    has once skew is accounted for — 20 listed sources with one
    dominating is effectively far fewer, and mixture decisions should
    use this number, not the listed count (the exponential face of
    q_gini's concentration). One group agg per dimension + a 1-row
    entropy fold."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    outs = []
    for col in ("source", "lang"):
        g = docs.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        tot = g.agg(F.sum("c").alias("t"))
        p = F.col("c") * 1.0 / F.col("t")
        eff = (
            g.crossJoin(F.broadcast(tot))
            .agg(
                F.count(F.lit(1)).alias("n_listed"),
                F.round(F.exp(-F.sum(p * F.log(p))), 6).alias("n_effective"),
            )
            .select(F.lit(col).alias("dimension"), "n_listed", "n_effective")
        )
        outs.append(eff)
    return outs[0].unionByName(outs[1])
