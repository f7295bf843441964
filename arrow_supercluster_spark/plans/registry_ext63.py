"""Round-2 registry additions, batch 58 — spatial parameter sweeps and
product engagement:

- q_dbscan_sweep: core/border/noise counts at eps ∈ {1, 2, 3} — the
  density-threshold tuning curve (role counts need only neighbor
  counts, no transitive closure — so the whole sweep stays
  closure-free on BOTH engines);
- q_dau_wau: daily active users, trailing-7-day weekly actives, and
  the DAU/WAU stickiness ratio — the canonical product-health series.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points
from arrow_supercluster_spark.sources.tables import read_events

_SWEEP_EPS = (1.0, 2.0, 3.0)
_SWEEP_MINPTS = 4


def _sql_dbscan_roles(eps: float) -> str:
    return f"""
    SELECT {eps} AS eps,
           SUM(CASE WHEN role = 'core' THEN 1 ELSE 0 END) AS n_core,
           SUM(CASE WHEN role = 'border' THEN 1 ELSE 0 END) AS n_border,
           SUM(CASE WHEN role = 'noise' THEN 1 ELSE 0 END) AS n_noise
    FROM (
      WITH pts AS (
        SELECT id, lng, lat,
               CAST(floor(lng / {eps}) AS BIGINT) AS cx,
               CAST(floor(lat / {eps}) AS BIGINT) AS cy
        FROM ({SQL_POINTS}) WHERE lng IS NOT NULL AND lat IS NOT NULL
      ),
      pairs AS (
        SELECT a.id AS a_id, b.id AS b_id
        FROM pts a JOIN pts b
          ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
         AND a.id <> b.id
        WHERE (a.lng - b.lng) * (a.lng - b.lng)
              + (a.lat - b.lat) * (a.lat - b.lat) <= {eps * eps}
      ),
      ncnt AS (SELECT a_id AS id, COUNT(*) AS n FROM pairs GROUP BY 1),
      cores AS (SELECT id FROM ncnt WHERE n + 1 >= {_SWEEP_MINPTS})
      SELECT p.id,
             CASE WHEN p.id IN (SELECT id FROM cores) THEN 'core'
                  WHEN EXISTS (SELECT 1 FROM pairs pr
                               WHERE pr.a_id = p.id
                                 AND pr.b_id IN (SELECT id FROM cores))
                  THEN 'border'
                  ELSE 'noise' END AS role
      FROM pts p
    )
    """


@register(
    "q_dbscan_sweep",
    " UNION ALL ".join(_sql_dbscan_roles(e) for e in _SWEEP_EPS),
)
def q_dbscan_sweep(spark, sf_dir):
    """Spatial tuning — the DBSCAN density-threshold curve: core/border/
    noise counts at eps ∈ {1,2,3}° (q_dedup_threshold_sweep's spatial
    twin). Role counts need only NEIGHBOR COUNTS — no component closure
    — so the sweep is three cell-join + agg rounds, closure-free on
    both engines (the labeled single-eps run is q_dbscan). Noise falls
    and cores rise monotonically with eps; the crossover region is
    where the production eps belongs."""
    pts = derived_points(spark, sf_dir).filter(
        F.col("lng").isNotNull() & F.col("lat").isNotNull()
    ).select("id", "lng", "lat")
    from arrow_supercluster_spark.operators.dbscan import _eps_pairs

    outs = []
    for eps in _SWEEP_EPS:
        pairs = _eps_pairs(pts, eps).localCheckpoint(eager=False)
        ncnt = pairs.groupBy(F.col("a_id").alias("id")).agg(
            F.count(F.lit(1)).alias("n")
        )
        cores = ncnt.filter(F.col("n") + 1 >= _SWEEP_MINPTS).select("id")
        n_core = cores.count()
        border = (
            pairs.join(cores.withColumnRenamed("id", "b_id"), "b_id", "leftsemi")
            .select(F.col("a_id").alias("id"))
            .distinct()
            .join(cores, "id", "left_anti")
        )
        n_border = border.count()
        n_total = pts.count()
        outs.append(
            (float(eps), n_core, n_border, n_total - n_core - n_border)
        )
    return spark.createDataFrame(
        outs, "eps double, n_core long, n_border long, n_noise long"
    )


@register(
    "q_dau_wau",
    """
    WITH user_day AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM user_day),
    dau AS (SELECT d, COUNT(*) AS dau FROM user_day GROUP BY d),
    wau AS (
      SELECT days.d, COUNT(DISTINCT ud.user_id) AS wau
      FROM days JOIN user_day ud
        ON ud.d <= days.d AND ud.d > days.d - INTERVAL 7 DAY
      GROUP BY days.d
    )
    SELECT epoch_us(dau.d) AS day_us, dau.dau, wau.wau,
           round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    """,
)
def q_dau_wau(spark, sf_dir):
    """Product health — DAU, trailing-7-day WAU, and DAU/WAU stickiness
    per day: the canonical engagement series. COUNT DISTINCT over a
    RANGE window isn't expressible as a window function, so WAU is the
    day-grid × user-day interval join — both sides collapse to
    |users×days| and |days| first, so the join is calendar-bounded
    however large the event stream. Integer-µs day keys."""
    ev = read_events(spark, sf_dir)
    user_day = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    days = user_day.select("d").distinct()
    dau = user_day.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    ud = user_day.select(F.col("user_id"), F.col("d").alias("ud_d"))
    wau = (
        days.join(
            ud,
            (F.col("ud_d") <= F.col("d"))
            & (F.col("ud_d") > F.col("d") - F.expr("INTERVAL 7 DAY")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.unix_micros("d").alias("day_us"), "dau", "wau",
            F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness"),
        )
    )
