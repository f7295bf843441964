"""Round-2 registry additions, batch 42 — windowed funnels, elasticity
regression, and survival analysis:

- q_funnel_within: view→purchase conversion WITHIN 7 days (the
  time-bounded funnel — q_funnel_conversion without a window
  overstates conversion);
- q_elasticity: log-log price-quantity regression per part brand over
  lineitem — the demand-elasticity readout;
- q_kaplan_meier: Kaplan-Meier survival curve over user lifetimes with
  right-censoring at the stream horizon.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events, read_table

# ===========================================================================
# Windowed funnel
# ===========================================================================

_FW_DAYS = 7


@register(
    "q_funnel_within",
    f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us
      FROM events GROUP BY 1
    ),
    conv AS (
      SELECT f.user_id, f.v_us,
             MIN(e.us) AS p_us
      FROM firsts f
      LEFT JOIN (
        SELECT user_id, epoch_us(ts) AS us FROM events
        WHERE event_type = 'purchase'
      ) e ON e.user_id = f.user_id
         AND e.us >= f.v_us
         AND e.us < f.v_us + {_FW_DAYS} * 86400000000
      WHERE f.v_us IS NOT NULL
      GROUP BY f.user_id, f.v_us
    )
    SELECT COUNT(*) AS n_viewers,
           SUM(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END) AS n_converted,
           round(SUM(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS conversion,
           round(AVG(CASE WHEN p_us IS NOT NULL
                     THEN (p_us - v_us) / 3600000000.0 END), 6) AS avg_hours
    FROM conv
    """,
)
def q_funnel_within(spark, sf_dir):
    """Funnel — view→purchase conversion WITHIN {d} days of the user's
    first view (the unbounded q_funnel_conversion counts a purchase
    months later as converted — attribution windows are how funnels are
    actually scored). One user-collapse for first views, a user-keyed
    join restricted by the integer-µs window, one summary agg. The
    interval condition rides the user equi-join — bounded per user,
    never a time-range cross join.""".format(d=_FW_DAYS)
    ev = read_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("v_us")
    ).filter(F.col("v_us").isNotNull())
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    conv = (
        firsts.join(
            purch,
            (purch.user_id == firsts.user_id)
            & (purch.us >= firsts.v_us)
            & (purch.us < firsts.v_us + _FW_DAYS * 86400000000),
            "left",
        )
        .groupBy(firsts.user_id, "v_us")
        .agg(F.min("us").alias("p_us"))
    )
    converted = F.col("p_us").isNotNull()
    return conv.agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.sum(converted.cast("int")).alias("n_converted"),
        F.round(F.sum(converted.cast("int")) * 1.0 / F.count(F.lit(1)), 6).alias(
            "conversion"
        ),
        F.round(
            F.avg(
                F.when(converted, (F.col("p_us") - F.col("v_us")) / 3600000000.0)
            ),
            6,
        ).alias("avg_hours"),
    )


# ===========================================================================
# Price elasticity
# ===========================================================================

@register(
    "q_elasticity",
    """
    WITH priced AS (
      SELECT p.p_brand,
             ln(l.l_quantity) AS lq,
             ln(l.l_extendedprice / l.l_quantity) AS lp
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    )
    SELECT p_brand,
           COUNT(*) AS n,
           round(regr_slope(lq, lp), 6) AS elasticity,
           round(corr(lq, lp), 6) AS r
    FROM priced GROUP BY 1
    """,
)
def q_elasticity(spark, sf_dir):
    """Economics — demand elasticity per brand: OLS slope of
    ln(quantity) on ln(unit price) over lineitem (the constant-
    elasticity model; slope ≈ %Δqty per %Δprice). One broadcast dim
    join (part), one regression aggregate per brand — the
    |brands|-bounded group family. Slope/corr round to 6."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    priced = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).select(
        "p_brand",
        F.log("l_quantity").alias("lq"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("lp"),
    )
    return priced.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("regr_slope(lq, lp)"), 6).alias("elasticity"),
        F.round(F.corr("lq", "lp"), 6).alias("r"),
    )


# ===========================================================================
# Kaplan-Meier
# ===========================================================================

_KM_CHURN_DAYS = 7


@register(
    "q_kaplan_meier",
    f"""
    WITH horizon AS (SELECT MAX(epoch_us(ts)) AS h_us FROM events),
    lifetimes AS (
      SELECT user_id,
             CAST(floor((MAX(epoch_us(ts)) - MIN(epoch_us(ts)))
                        / 86400000000.0) AS BIGINT) AS t_days,
             CAST(MAX(epoch_us(ts))
                  < (SELECT h_us FROM horizon) - {_KM_CHURN_DAYS} * 86400000000
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
           round(exp(SUM(CASE WHEN d < at_risk AND d > 0
                              THEN ln(1.0 - d * 1.0 / at_risk)
                              ELSE 0.0 END)
                     OVER (ORDER BY t_days
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
             AS survival
    FROM risk
    """,
)
def q_kaplan_meier(spark, sf_dir):
    """Survival — Kaplan-Meier curve over user lifetimes (days between
    first and last event), death = went silent ≥ {d} days before the
    stream horizon, survivors right-censored: Ŝ(t) = Π (1 − dᵢ/nᵢ),
    computed as exp of a running sum of logs — the product becomes a
    window scan (the EMA closed-form trick). Lifetimes are one
    user-keyed agg; the curve lives on the |distinct lifetimes|-bounded
    table; at-risk counts come from a reverse cumulative window.""".format(
        d=_KM_CHURN_DAYS
    )
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
                F.col("hi")
                < F.col("h_us") - _KM_CHURN_DAYS * 86400000000
            ).cast("int").alias("died"),
        )
    )
    risk = lt.groupBy("t_days").agg(
        F.sum("died").cast("long").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    w_desc = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = risk.select(
        "t_days", "d", F.sum("leaving").over(w_desc).cast("long").alias("at_risk")
    )
    log_term = F.when(
        (F.col("d") < F.col("at_risk")) & (F.col("d") > 0),
        F.log(1.0 - F.col("d") * 1.0 / F.col("at_risk")),
    ).otherwise(F.lit(0.0))
    w_asc = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, 0)
    return risk.select(
        "t_days", "d", "at_risk",
        F.round(F.exp(F.sum(log_term).over(w_asc)), 6).alias("survival"),
    )
