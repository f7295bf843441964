"""Round-7 registry additions, batch 197 — cross-series dependence
diagnostics (purchase vs click daily activity):

- q_cross_correlation: the CCF — Pearson r between purchase counts on
  day t and click counts on day t+lag for lag ∈ [−7, 7], with the
  peak-|r| lag flagged.  The lead/lag discovery tool ("do clicks lead
  purchases?"); per-lag moments are exact integer sums over the
  rank-aligned overlap.
- q_tail_dependence: empirical upper/lower tail-dependence
  coefficients λ_U = P(X>x_q | Y>y_q) and λ_L = P(X≤x_{1−q} |
  Y≤y_{1−q}) at q ∈ {0.75, 0.9} with type-1 marginal quantiles —
  the "do extremes co-occur" readout that correlation misses.
- q_empirical_copula: the empirical copula C(u,v) on the 3×3 grid
  u,v ∈ {0.25, 0.5, 0.75} with right-continuous marginal ECDFs,
  against the independence copula u·v — the full dependence-structure
  summary.

At 100 TB: all three collapse the corpus once to the ≤61-row daily
(x, y) frame; ranks/ECDFs/lags come from bounded self-joins on that
frame (never windows, never corpus-dimension pairs).  Counts are
exact integers; outputs round to 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_CCF_MAX_LAG = 7
_TD_QS = (75, 90)  # percent
_EC_GRID = (25, 50, 75)  # percent

_SQL_DAILY_XY = """
    daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    rk AS (
      SELECT a.d, MAX(a.x) AS x, MAX(a.y) AS y,
             CAST(COUNT(*) AS BIGINT) AS r
      FROM daily a JOIN daily b ON b.d <= a.d
      GROUP BY a.d
    )
"""


def _spark_daily_xy(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("y"),
    )
    b = daily.select(F.col("d").alias("bd"))
    rk = (
        daily.join(b, F.col("bd") <= F.col("d"))
        .groupBy("d")
        .agg(
            F.max("x").alias("x"),
            F.max("y").alias("y"),
            F.count(F.lit(1)).alias("r"),
        )
    )
    return daily, rk


# ===========================================================================
# R587 — cross-correlation function at lags -7..7
# ===========================================================================

@register(
    "q_cross_correlation",
    f"""
    WITH {_SQL_DAILY_XY},
    grid AS (
      SELECT lag FROM (VALUES {', '.join(
          f'({g})' for g in range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1))})
        g(lag)
    ),
    pairs AS (
      SELECT g.lag, a.x, b.y
      FROM grid g
      JOIN rk a ON TRUE
      JOIN rk b ON b.r = a.r + g.lag
    ),
    mom AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY 1
    ),
    rs AS (
      SELECT lag, n,
             (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                  * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy))
               AS r
      FROM mom
    ),
    mx AS (SELECT MAX(abs(r)) AS m FROM rs)
    SELECT lag, n, round(r, 6) AS ccf,
           abs(r) = m AS is_peak
    FROM rs CROSS JOIN mx
    ORDER BY lag
    """,
)
def q_cross_correlation(spark, sf_dir):
    """R587 — CCF(lag) = corr(x_t, y_{{t+lag}}), lag ∈ ±7: rank-aligned
    pairs from the day frame, Pearson per lag from six exact integer
    sums; the max-|r| lag carries is_peak."""
    daily, rk = _spark_daily_xy(spark, sf_dir)
    grid = spark.createDataFrame(
        [(g,) for g in range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1)],
        "lag INT",
    )
    a = rk.select(F.col("x").alias("ax"), F.col("r").alias("ar"))
    b = rk.select(F.col("y").alias("by"), F.col("r").alias("br"))
    pairs = (
        F.broadcast(grid)
        .join(a)
        .join(b, F.col("br") == F.col("ar") + F.col("lag"))
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ax").alias("sx"),
        F.sum("by").alias("sy"),
        F.sum(F.col("ax") * F.col("ax")).alias("sxx"),
        F.sum(F.col("by") * F.col("by")).alias("syy"),
        F.sum(F.col("ax") * F.col("by")).alias("sxy"),
    )
    r = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / F.sqrt(
        (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * (
            F.col("n") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    rs = mom.withColumn("r", r)
    mx = rs.agg(F.max(F.abs(F.col("r"))).alias("m"))
    return (
        rs.crossJoin(F.broadcast(mx))
        .select(
            "lag",
            "n",
            F.round("r", 6).alias("ccf"),
            (F.abs(F.col("r")) == F.col("m")).alias("is_peak"),
        )
        .orderBy("lag")
    )


# ===========================================================================
# R588 — empirical tail dependence
# ===========================================================================

def _sql_q(col: str, pq: int, name: str) -> str:
    """Type-1 quantile of {col} over the day frame: min v with
    100*cum >= pq*n."""
    return f"""{name} AS (
      SELECT MIN(v) AS q FROM (
        SELECT a.{col} AS v, CAST(COUNT(*) AS BIGINT) AS cum
        FROM (SELECT DISTINCT {col} FROM daily) a
        JOIN daily b ON b.{col} <= a.{col}
        GROUP BY 1
      ) c CROSS JOIN (SELECT COUNT(*) AS n FROM daily) n
      WHERE 100 * cum >= {pq} * n
    )"""


@register(
    "q_tail_dependence",
    f"""
    WITH {_SQL_DAILY_XY},
    {', '.join(
        f"{_sql_q('x', pq, f'xq{pq}')}, {_sql_q('y', pq, f'yq{pq}')}, "
        f"{_sql_q('x', 100 - pq, f'xl{pq}')}, "
        f"{_sql_q('y', 100 - pq, f'yl{pq}')}"
        for pq in _TD_QS)},
    rows_ AS (
      {' UNION ALL '.join(
          f'''SELECT {pq} / 100.0 AS q,
                 CAST(SUM(CASE WHEN d.x > xq{pq}.q AND d.y > yq{pq}.q
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_joint_u,
                 round(SUM(CASE WHEN d.x > xq{pq}.q AND d.y > yq{pq}.q
                           THEN 1 ELSE 0 END) * 1.0
                       / NULLIF(SUM(CASE WHEN d.y > yq{pq}.q
                                    THEN 1 ELSE 0 END), 0), 6)
                   AS lambda_u,
                 round(SUM(CASE WHEN d.x <= xl{pq}.q AND d.y <= yl{pq}.q
                           THEN 1 ELSE 0 END) * 1.0
                       / NULLIF(SUM(CASE WHEN d.y <= yl{pq}.q
                                    THEN 1 ELSE 0 END), 0), 6)
                   AS lambda_l
              FROM daily d CROSS JOIN xq{pq} CROSS JOIN yq{pq}
                   CROSS JOIN xl{pq} CROSS JOIN yl{pq}'''
          for pq in _TD_QS)}
    )
    SELECT q, n_joint_u, lambda_u, lambda_l FROM rows_ ORDER BY q
    """,
)
def q_tail_dependence(spark, sf_dir):
    """R588 — λ_U(q) = P(X>x_q | Y>y_q), λ_L(q) = P(X≤x_{{1−q}} |
    Y≤y_{{1−q}}) with type-1 marginal quantiles (integer-exact cuts)
    — co-occurrence of extremes across the two activity series."""
    daily, _ = _spark_daily_xy(spark, sf_dir)

    def t1q(col, pq):
        dv = daily.select(col).distinct()
        b = daily.select(F.col(col).alias("bv"))
        n = daily.count()  # day frame: bounded by the calendar
        cum = (
            dv.join(b, F.col("bv") <= F.col(col))
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cum"))
        )
        return (
            cum.filter(100 * F.col("cum") >= pq * n)
            .agg(F.min(col).alias("q"))
            .collect()[0]["q"]
        )

    parts = []
    for pq in _TD_QS:
        xq, yq = t1q("x", pq), t1q("y", pq)
        xl, yl = t1q("x", 100 - pq), t1q("y", 100 - pq)
        parts.append(
            daily.agg(
                F.lit(pq / 100.0).alias("q"),
                F.sum(
                    F.when(
                        (F.col("x") > xq) & (F.col("y") > yq), 1
                    ).otherwise(0)
                ).alias("n_joint_u"),
                F.round(
                    F.sum(
                        F.when(
                            (F.col("x") > xq) & (F.col("y") > yq), 1
                        ).otherwise(0)
                    )
                    * 1.0
                    / F.nullif(
                        F.sum(
                            F.when(F.col("y") > yq, 1).otherwise(0)
                        ),
                        F.lit(0),
                    ),
                    6,
                ).alias("lambda_u"),
                F.round(
                    F.sum(
                        F.when(
                            (F.col("x") <= xl) & (F.col("y") <= yl), 1
                        ).otherwise(0)
                    )
                    * 1.0
                    / F.nullif(
                        F.sum(
                            F.when(F.col("y") <= yl, 1).otherwise(0)
                        ),
                        F.lit(0),
                    ),
                    6,
                ).alias("lambda_l"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("q")


# ===========================================================================
# R589 — empirical copula on the quartile grid
# ===========================================================================

@register(
    "q_empirical_copula",
    f"""
    WITH {_SQL_DAILY_XY},
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    ecdf AS (
      SELECT a.d,
             CAST(SUM(CASE WHEN b.x <= a.x THEN 1 ELSE 0 END)
                  AS BIGINT) AS fx,
             CAST(SUM(CASE WHEN b.y <= a.y THEN 1 ELSE 0 END)
                  AS BIGINT) AS fy
      FROM daily a JOIN daily b ON TRUE
      GROUP BY 1
    ),
    grid AS (
      SELECT u, v FROM (VALUES {', '.join(
          f'({u}, {v})' for u in _EC_GRID for v in _EC_GRID)}) g(u, v)
    )
    SELECT g.u / 100.0 AS u, g.v / 100.0 AS v,
           round(SUM(CASE WHEN 100 * e.fx <= g.u * n.n
                           AND 100 * e.fy <= g.v * n.n
                          THEN 1 ELSE 0 END) * 1.0 / n.n, 6)
             AS copula,
           g.u * g.v / 10000.0 AS independence,
           round(SUM(CASE WHEN 100 * e.fx <= g.u * n.n
                           AND 100 * e.fy <= g.v * n.n
                          THEN 1 ELSE 0 END) * 1.0 / n.n
                 - g.u * g.v / 10000.0, 6) AS excess
    FROM grid g CROSS JOIN n JOIN ecdf e ON TRUE
    GROUP BY g.u, g.v, n.n
    ORDER BY u, v
    """,
)
def q_empirical_copula(spark, sf_dir):
    """R589 — C(u, v) = (1/n)Σ_t 1{{F_X(x_t) ≤ u, F_Y(y_t) ≤ v}} with
    right-continuous ECDFs (integer-exact: 100·rank ≤ u·n), on the
    quartile grid; excess over the independence copula u·v is the
    dependence signal.  ECDF ranks via the bounded day self-join."""
    daily, _ = _spark_daily_xy(spark, sf_dir)
    n_rows = daily.count()  # day frame: bounded by the calendar
    b = daily.select(
        F.col("x").alias("bx"), F.col("y").alias("by")
    )
    ecdf = (
        daily.join(b)
        .groupBy("d")
        .agg(
            F.sum(
                F.when(F.col("bx") <= F.col("x"), 1).otherwise(0)
            ).alias("fx"),
            F.sum(
                F.when(F.col("by") <= F.col("y"), 1).otherwise(0)
            ).alias("fy"),
        )
    )
    grid = spark.createDataFrame(
        [(u, v) for u in _EC_GRID for v in _EC_GRID], "u INT, v INT"
    )
    hit = F.when(
        (100 * F.col("fx") <= F.col("u") * n_rows)
        & (100 * F.col("fy") <= F.col("v") * n_rows),
        1,
    ).otherwise(0)
    return (
        F.broadcast(grid)
        .join(ecdf)
        .groupBy("u", "v")
        .agg(F.sum(hit).alias("c"))
        .select(
            (F.col("u") / 100.0).alias("u"),
            (F.col("v") / 100.0).alias("v"),
            F.round(F.col("c") * 1.0 / n_rows, 6).alias("copula"),
            (F.col("u") * F.col("v") / 10000.0).alias("independence"),
            F.round(
                F.col("c") * 1.0 / n_rows
                - F.col("u") * F.col("v") / 10000.0,
                6,
            ).alias("excess"),
        )
        .orderBy("u", "v")
    )
