"""Round-8 registry additions, batch 216 — survival-analysis
completions (beside q_kaplan_meier / q_hazard_rate / q_nelson_aalen /
q_rmst):

- q_logrank: the two-sample log-rank test between user-parity cohorts
  on the shared churn-lifetime construction — O−E and hypergeometric
  variance per distinct death time, χ² = (Σ(d₁−e₁))²/ΣV.  THE standard
  "do these cohorts churn differently" test.
- q_life_table: the actuarial life table on 5-day intervals —
  entering/deaths/censored per interval, effective exposure n − c/2,
  conditional q = d/(n−c/2), cumulative survival product.  The grouped
  counterpart of the KM step curve.
- q_cumulative_incidence: competing risks by Aalen-Johansen — each
  user's FIRST post-entry purchase vs error, whichever comes first, is
  the event; CIF_k(t) = Σ_{{s≤t}} S(s⁻)·d_k(s)/n(s) with the overall
  KM survival S.  Reads what naive per-cause KM double-counts.

All three collapse to per-user lifetimes with one agg, then work on
the ≤31-row distinct-time frame (calendar-bounded global windows,
allowlisted).  At 100 TB: one user-grain agg + literal-frame algebra.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_CHURN_DAYS = 7  # the q_kaplan_meier churn rule, shared
_LT_INTERVAL = 5

_SQL_LIFE = f"""
    horizon AS (SELECT MAX(epoch_us(ts)) AS h_us FROM events),
    lifetimes AS MATERIALIZED (
      SELECT user_id, user_id % 2 AS grp,
             CAST(floor((MAX(epoch_us(ts)) - MIN(epoch_us(ts)))
                        / 86400000000.0) AS BIGINT) AS t_days,
             CAST(MAX(epoch_us(ts))
                  < (SELECT h_us FROM horizon)
                    - {_CHURN_DAYS} * 86400000000
                  AS INTEGER) AS died
      FROM events GROUP BY user_id
    )"""


def _spark_lifetimes(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    horizon = ev.agg(
        F.max(F.unix_micros("ts")).alias("h_us")
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.floor(
                (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
                / 86400000000.0
            )
            .cast("long")
            .alias("t_days"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            (F.col("user_id") % 2).alias("grp"),
            "t_days",
            (
                F.col("last_us")
                < F.col("h_us") - _CHURN_DAYS * 86400000000
            )
            .cast("int")
            .alias("died"),
        )
    )


@register(
    "q_logrank",
    f"""
    WITH {_SQL_LIFE},
    times AS (
      SELECT DISTINCT t_days AS t FROM lifetimes WHERE died = 1
    ),
    at_t AS (
      SELECT times.t,
             CAST(SUM(CASE WHEN l.t_days >= times.t THEN 1 ELSE 0 END)
                  AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l.t_days >= times.t AND l.grp = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN l.t_days = times.t AND l.died = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN l.t_days = times.t AND l.died = 1
                           AND l.grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1
      FROM times CROSS JOIN lifetimes l
      GROUP BY times.t
    ),
    oe AS (
      SELECT COALESCE(SUM(d1 - d * (n1 * 1.0 / n)), 0.0) AS o_minus_e,
             COALESCE(SUM(CASE WHEN n > 1
                 THEN d * (n1 * 1.0 / n) * (1.0 - n1 * 1.0 / n)
                      * (n - d) / (n - 1.0)
                 ELSE 0.0 END), 0.0) AS v
      FROM at_t
    )
    SELECT CAST((SELECT COUNT(*) FROM at_t) AS BIGINT) AS n_death_times,
           round(o_minus_e, 6) AS o_minus_e,
           round(v, 6) AS variance,
           round(CASE WHEN v > 0 THEN o_minus_e * o_minus_e / v END, 6)
             AS logrank_chi2,
           round(CASE WHEN v > 0 THEN o_minus_e / sqrt(v) END, 6) AS z
    FROM oe
    """,
)
def q_logrank(spark, sf_dir):
    """R641 — two-sample log-rank between user-parity cohorts on the
    q_kaplan_meier lifetime construction (churn = {c}-day silence
    before the horizon): per distinct death time, observed group-1
    deaths vs the hypergeometric expectation d·n₁/n and variance
    d·(n₁/n)(1−n₁/n)(n−d)/(n−1); χ² = (ΣO−E)²/ΣV.  The times frame is
    calendar-bounded, so the at-risk counts are one cross join over
    ≤31 × |users| rows collapsed immediately.""".format(c=_CHURN_DAYS)
    life = _spark_lifetimes(spark, sf_dir)
    times = (
        life.filter(F.col("died") == 1)
        .select(F.col("t_days").alias("t"))
        .distinct()
    )
    at_t = (
        times.crossJoin(life)
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("t_days") >= F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("n"),
            F.sum(
                F.when(
                    (F.col("t_days") >= F.col("t")) & (F.col("grp") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n1"),
            F.sum(
                F.when(
                    (F.col("t_days") == F.col("t")) & (F.col("died") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("d"),
            F.sum(
                F.when(
                    (F.col("t_days") == F.col("t"))
                    & (F.col("died") == 1)
                    & (F.col("grp") == 1),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("d1"),
        )
    )
    oe = at_t.agg(
        F.count(F.lit(1)).alias("n_death_times"),
        F.coalesce(
            F.sum(
                F.col("d1")
                - F.col("d") * (F.col("n1") * 1.0 / F.col("n"))
            ),
            F.lit(0.0),
        ).alias("o_minus_e"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n") > 1,
                    F.col("d")
                    * (F.col("n1") * 1.0 / F.col("n"))
                    * (1.0 - F.col("n1") * 1.0 / F.col("n"))
                    * (F.col("n") - F.col("d"))
                    / (F.col("n") - 1.0),
                ).otherwise(0.0)
            ),
            F.lit(0.0),
        ).alias("v"),
    )
    return oe.select(
        F.col("n_death_times").cast("long").alias("n_death_times"),
        F.round("o_minus_e", 6).alias("o_minus_e"),
        F.round("v", 6).alias("variance"),
        F.round(
            F.when(
                F.col("v") > 0,
                F.col("o_minus_e") * F.col("o_minus_e") / F.col("v"),
            ),
            6,
        ).alias("logrank_chi2"),
        F.round(
            F.when(F.col("v") > 0, F.col("o_minus_e") / F.sqrt("v")), 6
        ).alias("z"),
    )


@register(
    "q_life_table",
    f"""
    WITH {_SQL_LIFE},
    binned AS (
      SELECT CAST(t_days // {_LT_INTERVAL} AS BIGINT) AS iv,
             CAST(SUM(died) AS BIGINT) AS d,
             CAST(SUM(1 - died) AS BIGINT) AS c,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM lifetimes GROUP BY 1
    ),
    tab AS (
      SELECT iv, d, c,
             CAST(SUM(leaving) OVER (ORDER BY iv DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_enter
      FROM binned
    ),
    q AS (
      SELECT iv, d, c, n_enter,
             n_enter - c / 2.0 AS exposure,
             CASE WHEN n_enter - c / 2.0 > 0
                  THEN d / (n_enter - c / 2.0) ELSE 0.0 END AS q_i
      FROM tab
    )
    SELECT iv AS interval_idx,
           CAST(iv * {_LT_INTERVAL} AS BIGINT) AS t_lo,
           n_enter, d AS deaths, c AS censored,
           round(exposure, 1) AS exposure,
           round(q_i, 6) AS cond_mortality,
           round(exp(SUM(CASE WHEN q_i < 1 AND q_i > 0
                              THEN ln(1.0 - q_i) ELSE 0.0 END)
                     OVER (ORDER BY iv
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                 6) AS survival
    FROM q ORDER BY iv
    """,
)
def q_life_table(spark, sf_dir):
    """R642 — actuarial life table on {w}-day intervals over the shared
    lifetime frame: entering cohort (reverse-cumulative leavers),
    deaths/censored per interval, actuarial exposure n − c/2,
    conditional mortality q = d/exposure and the cumulative survival
    product (log-sum form — the q_kaplan_meier float discipline).  The
    interval frame is ≤ ⌈31/{w}⌉ rows.""".format(w=_LT_INTERVAL)
    life = _spark_lifetimes(spark, sf_dir)
    binned = life.groupBy(
        (F.col("t_days") / _LT_INTERVAL).cast("long").alias("iv")
    ).agg(
        F.sum("died").cast("long").alias("d"),
        F.sum(1 - F.col("died")).cast("long").alias("c"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_rev = (
        Window.orderBy(F.col("iv").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tab = binned.select(
        "iv", "d", "c",
        F.sum("leaving").over(w_rev).cast("long").alias("n_enter"),
    )
    q = tab.select(
        "*",
        (F.col("n_enter") - F.col("c") / 2.0).alias("exposure"),
        F.when(
            F.col("n_enter") - F.col("c") / 2.0 > 0,
            F.col("d") / (F.col("n_enter") - F.col("c") / 2.0),
        )
        .otherwise(0.0)
        .alias("q_i"),
    )
    w_fwd = (
        Window.orderBy("iv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return q.select(
        F.col("iv").alias("interval_idx"),
        (F.col("iv") * _LT_INTERVAL).cast("long").alias("t_lo"),
        "n_enter",
        F.col("d").alias("deaths"),
        F.col("c").alias("censored"),
        F.round("exposure", 1).alias("exposure"),
        F.round("q_i", 6).alias("cond_mortality"),
        F.round(
            F.exp(
                F.sum(
                    F.when(
                        (F.col("q_i") < 1) & (F.col("q_i") > 0),
                        F.log(1.0 - F.col("q_i")),
                    ).otherwise(0.0)
                ).over(w_fwd)
            ),
            6,
        ).alias("survival"),
    ).orderBy("interval_idx")


@register(
    "q_cumulative_incidence",
    """
    WITH firsts AS MATERIALIZED (
      SELECT user_id,
             MIN(epoch_us(ts)) AS t0,
             MIN(CASE WHEN event_type = 'purchase'
                 THEN epoch_us(ts) END) AS tp,
             MIN(CASE WHEN event_type = 'error'
                 THEN epoch_us(ts) END) AS te,
             MAX(epoch_us(ts)) AS tmax
      FROM events GROUP BY user_id
    ),
    subjects AS MATERIALIZED (
      SELECT user_id,
             CASE
               WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                 THEN 'purchase'
               WHEN te IS NOT NULL THEN 'error'
               ELSE 'censored' END AS cause,
             CAST(floor((COALESCE(LEAST(tp, te), tp, te, tmax) - t0)
                        / 86400000000.0) AS BIGINT) AS t
      FROM firsts
    ),
    times AS (SELECT DISTINCT t FROM subjects WHERE cause != 'censored'),
    at_t AS (
      SELECT times.t,
             CAST(SUM(CASE WHEN s.t >= times.t THEN 1 ELSE 0 END)
                  AS BIGINT) AS n,
             CAST(SUM(CASE WHEN s.t = times.t
                           AND s.cause = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS dp,
             CAST(SUM(CASE WHEN s.t = times.t AND s.cause = 'error'
                      THEN 1 ELSE 0 END) AS BIGINT) AS de
      FROM times CROSS JOIN subjects s
      GROUP BY times.t
    ),
    km AS (
      SELECT t, n, dp, de,
             CASE WHEN MAX(CASE WHEN dp + de >= n THEN 1 ELSE 0 END)
                    OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                  THEN 0.0
             ELSE exp(SUM(CASE WHEN (dp + de) < n AND (dp + de) > 0
                          THEN ln(1.0 - (dp + de) * 1.0 / n)
                          ELSE 0.0 END)
                 OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             END AS s_t,
             CASE WHEN COALESCE(MAX(CASE WHEN dp + de >= n
                                    THEN 1 ELSE 0 END)
                    OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) = 1
                  THEN 0.0
             ELSE COALESCE(exp(SUM(CASE WHEN (dp + de) < n AND (dp + de) > 0
                              THEN ln(1.0 - (dp + de) * 1.0 / n)
                              ELSE 0.0 END)
                 OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
               1.0)
             END AS s_prev
      FROM at_t
    )
    SELECT t AS t_days, n AS at_risk, dp AS d_purchase, de AS d_error,
           round(SUM(s_prev * dp / n)
                 OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cif_purchase,
           round(SUM(s_prev * de / n)
                 OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cif_error,
           round(s_t, 6) AS event_free_survival
    FROM km ORDER BY t
    """,
)
def q_cumulative_incidence(spark, sf_dir):
    """R643 — Aalen-Johansen cumulative incidence under competing
    risks: each user's first purchase vs first error (whichever comes
    first; ties → purchase, stated) from their first event; users with
    neither are censored at their last event.  CIF_k(t) =
    Σ_{s≤t} S(s⁻)·d_k(s)/n(s) with S the all-cause KM —
    CIF_p + CIF_e + S = 1 at every step (tested).  Naive per-cause KM
    overstates both curves; this is the correct decomposition.  The
    time frame is calendar-bounded."""
    ev = read_events(spark, sf_dir)
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(us).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", us)
        ).alias("tp"),
        F.min(F.when(F.col("event_type") == "error", us)).alias("te"),
        F.max(us).alias("tmax"),
    )
    cause = (
        F.when(
            F.col("tp").isNotNull()
            & (F.col("te").isNull() | (F.col("tp") <= F.col("te"))),
            F.lit("purchase"),
        )
        .when(F.col("te").isNotNull(), F.lit("error"))
        .otherwise(F.lit("censored"))
    )
    subjects = firsts.select(
        "user_id",
        cause.alias("cause"),
        F.floor(
            (
                F.coalesce(
                    F.least("tp", "te"), F.col("tp"), F.col("te"),
                    F.col("tmax"),
                )
                - F.col("t0")
            )
            / 86400000000.0
        )
        .cast("long")
        .alias("t"),
    )
    times = (
        subjects.filter(F.col("cause") != "censored")
        .select("t")
        .distinct()
    )
    s = subjects.alias("s")
    at_t = (
        times.alias("times")
        .crossJoin(s)
        .groupBy(F.col("times.t").alias("t"))
        .agg(
            F.sum(
                F.when(F.col("s.t") >= F.col("times.t"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n"),
            F.sum(
                F.when(
                    (F.col("s.t") == F.col("times.t"))
                    & (F.col("cause") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("dp"),
            F.sum(
                F.when(
                    (F.col("s.t") == F.col("times.t"))
                    & (F.col("cause") == "error"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("de"),
        )
    )
    w_cur = (
        Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev = (
        Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    step = F.when(
        ((F.col("dp") + F.col("de")) < F.col("n"))
        & ((F.col("dp") + F.col("de")) > 0),
        F.log(1.0 - (F.col("dp") + F.col("de")) * 1.0 / F.col("n")),
    ).otherwise(0.0)
    dead = F.when(
        F.col("dp") + F.col("de") >= F.col("n"), 1
    ).otherwise(0)
    km = at_t.select(
        "t", "n", "dp", "de",
        F.when(F.max(dead).over(w_cur) == 1, 0.0)
        .otherwise(F.exp(F.sum(step).over(w_cur)))
        .alias("s_t"),
        F.when(F.coalesce(F.max(dead).over(w_prev), F.lit(0)) == 1, 0.0)
        .otherwise(
            F.coalesce(F.exp(F.sum(step).over(w_prev)), F.lit(1.0))
        )
        .alias("s_prev"),
    )
    return km.select(
        F.col("t").alias("t_days"),
        F.col("n").alias("at_risk"),
        F.col("dp").alias("d_purchase"),
        F.col("de").alias("d_error"),
        F.round(
            F.sum(F.col("s_prev") * F.col("dp") / F.col("n")).over(w_cur),
            6,
        ).alias("cif_purchase"),
        F.round(
            F.sum(F.col("s_prev") * F.col("de") / F.col("n")).over(w_cur),
            6,
        ).alias("cif_error"),
        F.round("s_t", 6).alias("event_free_survival"),
    ).orderBy("t_days")
