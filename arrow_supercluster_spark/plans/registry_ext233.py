"""Round-9 registry additions, batch 233 — forecasting completion,
SQL-backed:

- q_theta_method: the Theta(0, 2) forecaster (Assimakopoulos &
  Nikolopoulos 2000 — the M3 winner): average of the linear-trend
  extrapolation (theta = 0 line) and SES of the theta = 2 line; SES
  collapses to the closed power-weighted sum (the q_ema_daily
  algebra), so the whole method is closed-form — no recursion.
  (A chrF sibling was drafted and dropped — q_chrf already ships in
  registry_ext181.)

At 100 TB: Theta's series is calendar-bounded; the only corpus-sized
stage is the daily count agg.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# R682 — Theta(0, 2) forecasting method
# ===========================================================================

_THETA_ALPHA = 0.5
_THETA_H = 7


@register(
    "q_theta_method",
    f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily
    ),
    ols AS MATERIALIZED (
      SELECT COUNT(*) AS n,
             (COUNT(*) * SUM(t * y) - SUM(t) * SUM(y))
               / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t) * 1.0) AS b,
             (SUM(y) - (COUNT(*) * SUM(t * y) - SUM(t) * SUM(y))
                       / (COUNT(*) * SUM(t * t) - SUM(t) * SUM(t) * 1.0)
                       * SUM(t)) / COUNT(*) AS a
      FROM idx
    ),
    z AS MATERIALIZED (
      SELECT idx.t, 2 * idx.y - (ols.a + ols.b * idx.t) AS z
      FROM idx CROSS JOIN ols
    ),
    ses AS MATERIALIZED (
      -- closed-form SES level: l_n = αΣ(1−α)^(n−t)z_t + (1−α)^(n−1)z_1
      -- ... with l_1 = z_1 the α weight starts at t = 2
      SELECT SUM(CASE WHEN z.t = 1
                      THEN power(1 - {_THETA_ALPHA}, ols.n - 1) * z.z
                      ELSE {_THETA_ALPHA}
                           * power(1 - {_THETA_ALPHA}, ols.n - z.t) * z.z
                 END) AS l
      FROM z CROSS JOIN ols
    )
    SELECT h.h,
           round(0.5 * (ols.a + ols.b * (ols.n + h.h)) + 0.5 * ses.l, 6)
             AS forecast
    FROM ols CROSS JOIN ses,
         (SELECT UNNEST(range(1, {_THETA_H} + 1)) AS h) h
    ORDER BY h.h
    """,
)
def q_theta_method(spark, sf_dir):
    """R682 — the Theta(0, 2) method over daily event counts: the
    theta = 0 line is the OLS trend (closed form), the theta = 2 line
    zₜ = 2yₜ − trendₜ doubles the local curvature, SES (α = {a}) of z
    collapses to the closed power-weighted sum (l₁ = z₁ — no
    recursion), and the h-step forecast averages the extrapolated
    trend with the SES level — the M3-winning combination.  The SES
    weights are the q_ema_daily algebra; everything is calendar-
    bounded past the daily agg.""".format(a=_THETA_ALPHA)
    al = _THETA_ALPHA
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    from arrow_supercluster_spark.functions.distrank import zip_scan

    idx0, _, _ = zip_scan(daily, ["d"], out="t0")
    idx = idx0.select("y", (F.col("t0") + 1).alias("t"))
    ols = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    ).select(
        "n",
        (
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
            / (F.col("n") * F.col("stt") - F.col("st") * F.col("st") * 1.0)
        ).alias("b"),
        (
            (
                F.col("sy")
                - (F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
                / (
                    F.col("n") * F.col("stt")
                    - F.col("st") * F.col("st") * 1.0
                )
                * F.col("st")
            )
            / F.col("n")
        ).alias("a"),
    )
    z = idx.crossJoin(F.broadcast(ols)).select(
        "t",
        "n",
        "a",
        "b",
        (2 * F.col("y") - (F.col("a") + F.col("b") * F.col("t"))).alias("z"),
    )
    ses = z.agg(
        F.sum(
            F.when(
                F.col("t") == 1,
                F.pow(F.lit(1 - al), F.col("n") - 1) * F.col("z"),
            ).otherwise(
                al * F.pow(F.lit(1 - al), F.col("n") - F.col("t")) * F.col("z")
            )
        ).alias("l")
    )
    h = spark.range(1, _THETA_H + 1).select(
        F.col("id").cast("int").alias("h")
    )
    return (
        ols.crossJoin(ses)
        .crossJoin(F.broadcast(h))
        .select(
            "h",
            F.round(
                0.5 * (F.col("a") + F.col("b") * (F.col("n") + F.col("h")))
                + 0.5 * F.col("l"),
                6,
            ).alias("forecast"),
        )
        .orderBy("h")
    )
