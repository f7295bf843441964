"""Round-5 registry additions, batch 134 — growth accounting, local
spatial association, and the revenue bridge:

- q_growth_accounting: weekly user growth accounting — every active
  user classified NEW (first week ever), RETAINED (active both
  weeks), or RESURRECTED (returning after a gap), with CHURNED
  measured against the prior week; the accounting identity
  active_t = new + retained + resurrected (and
  churned_t = active_{t-1} − retained_t) holds exactly and is
  asserted. The a16z growth-decomposition that explains WHERE a flat
  MAU curve comes from.
- q_local_morans: local Moran's I (LISA) per grid cell — Iᵢ =
  (dᵢ Σⱼ wᵢⱼ dⱼ)/m₂ over rook neighbors, deviations integer-scaled;
  cells classified HH/LL/HL/LH by the signs of own and lagged
  deviation. The hotspot map q_morans_i's single global number
  cannot draw (a global I near 0 can hide strong local pockets).
- q_mrr_bridge: week-over-week revenue movement — each user's weekly
  purchase cents classified into new / resurrected / expansion /
  contraction / churned revenue, with the bridge identity
  rev_t = rev_{t-1} + new + resurrected + expansion − contraction −
  churned exact in integer cents. The SaaS-MRR decomposition applied
  to transactional revenue.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry_core import (
    _SQL_XY,
    _points_xy,
    register,
)
from arrow_supercluster_spark.sources.tables import read_events

_LM_ZOOM = 6
_LM_SCALE = 1_000_000
_LM_TOP = 10


# ===========================================================================
# R395 — weekly growth accounting
# ===========================================================================

_SQL_UW = """
    SELECT DISTINCT user_id,
           (CAST(strftime(ts, '%d') AS INTEGER) - 1) // 7 AS w
    FROM events
"""


@register(
    "q_growth_accounting",
    f"""
    WITH uw AS ({_SQL_UW}),
    firsts AS (SELECT user_id, MIN(w) AS w0 FROM uw GROUP BY user_id),
    labeled AS (
      SELECT uw.user_id, uw.w,
             CASE WHEN uw.w = f.w0 THEN 'new'
                  WHEN EXISTS (SELECT 1 FROM uw p
                               WHERE p.user_id = uw.user_id
                                 AND p.w = uw.w - 1) THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM uw JOIN firsts f ON f.user_id = uw.user_id
    ),
    weekly AS (
      SELECT w,
             CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END)
                  AS BIGINT) AS new_users,
             CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                  AS BIGINT) AS retained,
             CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                  AS BIGINT) AS resurrected,
             CAST(COUNT(*) AS BIGINT) AS active
      FROM labeled GROUP BY w
    ),
    churn AS (
      SELECT w, active, new_users, retained, resurrected,
             coalesce((SELECT w2.active FROM weekly w2
                       WHERE w2.w = weekly.w - 1), 0) - retained
               AS churned_from_prev
      FROM weekly
    )
    SELECT w AS week, active, new_users, retained, resurrected,
           CAST(churned_from_prev AS BIGINT) AS churned_from_prev
    FROM churn
    ORDER BY week
    """,
)
def q_growth_accounting(spark, sf_dir):
    """R395 — growth accounting by week: every (user, week) activity
    fact gets exactly one label — NEW (w = user's first week),
    RETAINED (also active in w−1), RESURRECTED (returning after a
    gap) — so active_t ≡ new + retained + resurrected by
    construction, and churned_t = active_{{t−1}} − retained_t closes
    the bridge (both identities asserted in tests). One distinct
    (user, week) frame, a broadcastable first-week table, and a
    week-shift self-join. The decomposition that says whether growth
    is acquisition, retention, or a resurrection treadmill."""
    ev = read_events(spark, sf_dir)
    uw = ev.select(
        "user_id",
        ((F.dayofmonth("ts") - 1) / 7).cast("long").alias("w"),
    ).distinct()
    firsts = uw.groupBy("user_id").agg(F.min("w").alias("w0"))
    prev = uw.select("user_id", (F.col("w") + 1).alias("w"))
    labeled = (
        uw.join(firsts, "user_id")
        .join(prev.withColumn("was_prev", F.lit(1)), ["user_id", "w"], "left")
        .select(
            "w",
            F.when(F.col("w") == F.col("w0"), "new")
            .when(F.col("was_prev") == 1, "retained")
            .otherwise("resurrected")
            .alias("status"),
        )
    )
    weekly = labeled.groupBy("w").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias(
            "new_users"
        ),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).alias(
            "retained"
        ),
        F.sum(
            F.when(F.col("status") == "resurrected", 1).otherwise(0)
        ).alias("resurrected"),
        F.count(F.lit(1)).alias("active"),
    )
    prev_w = weekly.select(
        (F.col("w") + 1).alias("w"), F.col("active").alias("prev_active")
    )
    return (
        weekly.join(prev_w, "w", "left")
        .select(
            F.col("w").alias("week"),
            "active",
            "new_users",
            "retained",
            "resurrected",
            (F.coalesce("prev_active", F.lit(0)) - F.col("retained"))
            .cast("long")
            .alias("churned_from_prev"),
        )
        .orderBy("week")
    )


# ===========================================================================
# R396 — local Moran's I (LISA)
# ===========================================================================

@register(
    "q_local_morans",
    f"""
    WITH c AS (
      SELECT cell_x, cell_y, CAST(COUNT(*) AS DOUBLE) AS n
      FROM ({gc.sql_cells(_SQL_XY, _LM_ZOOM, OPTS)})
      GROUP BY 1, 2
    ),
    m AS (SELECT AVG(n) AS mu, COUNT(*) AS n_cells FROM c),
    dev AS (
      SELECT cell_x, cell_y,
             CAST(round((n - mu) * {_LM_SCALE}) AS BIGINT) AS d_s
      FROM c CROSS JOIN m
    ),
    m2 AS (
      SELECT SUM(d_s * 1.0 / {_LM_SCALE} * d_s) / COUNT(*) AS m2
      FROM dev
    ),
    lagged AS (
      SELECT a.cell_x, a.cell_y, a.d_s,
             CAST(SUM(b.d_s) AS BIGINT) AS lag_s,
             CAST(COUNT(*) AS BIGINT) AS n_nbrs
      FROM dev a JOIN dev b
        ON abs(a.cell_x - b.cell_x) + abs(a.cell_y - b.cell_y) = 1
      GROUP BY a.cell_x, a.cell_y, a.d_s
    ),
    lisa AS (
      SELECT cell_x, cell_y, n_nbrs,
             round(d_s * 1.0 / {_LM_SCALE}
                   * (lag_s * 1.0 / {_LM_SCALE})
                   / (SELECT m2 FROM m2), 6) AS local_i,
             CASE WHEN d_s >= 0 AND lag_s >= 0 THEN 'HH'
                  WHEN d_s < 0 AND lag_s < 0 THEN 'LL'
                  WHEN d_s >= 0 THEN 'HL'
                  ELSE 'LH' END AS quadrant
      FROM lagged
    )
    SELECT cell_x, cell_y, n_nbrs, local_i, quadrant
    FROM lisa
    ORDER BY abs(local_i) DESC, cell_x, cell_y
    LIMIT {_LM_TOP}
    """,
)
def q_local_morans(spark, sf_dir):
    """R396 — local Moran's I (LISA) at zoom {z}: per cell, Iᵢ =
    dᵢ·(Σⱼ∈rook dⱼ)/m₂ with deviations INTEGER-scaled before the
    neighbor sum (the lag is an exact integer; m₂ the only float
    reduction, over single-division terms), and the HH/LL/HL/LH
    quadrant off the deviation signs. Top-{t} by |Iᵢ| on the rounded
    score. q_morans_i answers 'is the field clustered overall'; LISA
    answers WHERE — HH cells are the hotspots, HL cells the outliers
    a global I averages away. One cell agg + one rook self-join.""".format(
        z=_LM_ZOOM, t=_LM_TOP
    )
    pts = _points_xy(spark, sf_dir)
    cells = gc.with_cells(pts, _LM_ZOOM, OPTS).groupBy(
        "cell_x", "cell_y"
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    m = cells.agg(F.avg("n").alias("mu"))
    dev = cells.crossJoin(F.broadcast(m)).select(
        "cell_x",
        "cell_y",
        F.round((F.col("n") - F.col("mu")) * _LM_SCALE)
        .cast("long")
        .alias("d_s"),
    )
    m2 = dev.agg(
        (
            F.sum(F.col("d_s") * 1.0 / _LM_SCALE * F.col("d_s"))
            / F.count(F.lit(1))
        ).alias("m2")
    )
    a = dev.select(
        F.col("cell_x").alias("ax"),
        F.col("cell_y").alias("ay"),
        F.col("d_s").alias("da"),
    )
    b = dev.select(
        F.col("cell_x").alias("bx"),
        F.col("cell_y").alias("by"),
        F.col("d_s").alias("db"),
    )
    lagged = (
        a.join(
            b,
            (F.abs(F.col("ax") - F.col("bx"))
             + F.abs(F.col("ay") - F.col("by"))) == 1,
        )
        .groupBy("ax", "ay", "da")
        .agg(
            F.sum("db").cast("long").alias("lag_s"),
            F.count(F.lit(1)).alias("n_nbrs"),
        )
    )
    lisa = lagged.crossJoin(F.broadcast(m2)).select(
        F.col("ax").alias("cell_x"),
        F.col("ay").alias("cell_y"),
        "n_nbrs",
        F.round(
            F.col("da")
            * 1.0
            / _LM_SCALE
            * (F.col("lag_s") * 1.0 / _LM_SCALE)
            / F.col("m2"),
            6,
        ).alias("local_i"),
        F.when((F.col("da") >= 0) & (F.col("lag_s") >= 0), "HH")
        .when((F.col("da") < 0) & (F.col("lag_s") < 0), "LL")
        .when(F.col("da") >= 0, "HL")
        .otherwise("LH")
        .alias("quadrant"),
    )
    return lisa.orderBy(
        F.abs(F.col("local_i")).desc(), "cell_x", "cell_y"
    ).limit(_LM_TOP)


# ===========================================================================
# R397 — MRR movement bridge
# ===========================================================================

@register(
    "q_mrr_bridge",
    """
    WITH uw AS (
      SELECT user_id,
             (CAST(strftime(ts, '%d') AS INTEGER) - 1) // 7 AS w,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    weeks AS (SELECT DISTINCT w FROM uw),
    users AS (SELECT DISTINCT user_id FROM uw),
    grid AS (
      SELECT u.user_id, wk.w, coalesce(uw.cents, 0) AS cents
      FROM users u CROSS JOIN weeks wk
      LEFT JOIN uw ON uw.user_id = u.user_id AND uw.w = wk.w
    ),
    firsts AS (
      SELECT user_id, MIN(w) AS w0 FROM uw WHERE cents > 0 GROUP BY 1
    ),
    moves AS (
      SELECT g.w, g.cents,
             coalesce(p.cents, 0) AS prev,
             CASE
               WHEN g.cents > 0 AND f.w0 = g.w THEN 'new'
               WHEN g.cents > 0 AND coalesce(p.cents, 0) = 0 THEN 'resurrected'
               WHEN g.cents > coalesce(p.cents, 0) THEN 'expansion'
               WHEN g.cents > 0 AND g.cents < p.cents THEN 'contraction'
               WHEN g.cents = 0 AND coalesce(p.cents, 0) > 0 THEN 'churned'
               ELSE 'flat' END AS move
      FROM grid g
      LEFT JOIN grid p ON p.user_id = g.user_id AND p.w = g.w - 1
      LEFT JOIN firsts f ON f.user_id = g.user_id
      WHERE g.w > (SELECT MIN(w) FROM weeks)
    )
    SELECT w AS week,
           CAST(SUM(cents) AS BIGINT) AS rev_cents,
           CAST(SUM(prev) AS BIGINT) AS prev_rev_cents,
           CAST(SUM(CASE WHEN move = 'new' THEN cents ELSE 0 END)
                AS BIGINT) AS new_rev,
           CAST(SUM(CASE WHEN move = 'resurrected' THEN cents ELSE 0 END)
                AS BIGINT) AS resurrected_rev,
           CAST(SUM(CASE WHEN move = 'expansion' THEN cents - prev
                         ELSE 0 END) AS BIGINT) AS expansion_rev,
           CAST(SUM(CASE WHEN move = 'contraction' THEN prev - cents
                         ELSE 0 END) AS BIGINT) AS contraction_rev,
           CAST(SUM(CASE WHEN move = 'churned' THEN prev ELSE 0 END)
                AS BIGINT) AS churned_rev
    FROM moves
    GROUP BY w
    ORDER BY week
    """,
)
def q_mrr_bridge(spark, sf_dir):
    """R397 — weekly revenue movement bridge: each user's weekly
    purchase cents (densified grid — silent weeks are true zeros)
    classified NEW (first paying week) / RESURRECTED (paying again
    after zero) / EXPANSION / CONTRACTION / CHURNED, with the exact
    integer identity rev_t = rev_{{t−1}} + new + resurrected +
    expansion − contraction − churned (asserted in tests — the
    decomposition is a PARTITION of the week-over-week delta). The
    SaaS-MRR bridge on transactional revenue: the same top-line can
    be healthy acquisition or a churn treadmill, and only the bridge
    says which."""
    ev = read_events(spark, sf_dir)
    uw = ev.groupBy(
        "user_id",
        ((F.dayofmonth("ts") - 1) / 7).cast("long").alias("w"),
    ).agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("cents")
    )
    weeks = uw.select("w").distinct()
    users = uw.select("user_id").distinct()
    grid = (
        users.crossJoin(F.broadcast(weeks))
        .join(uw, ["user_id", "w"], "left")
        .select("user_id", "w", F.coalesce("cents", F.lit(0)).alias("cents"))
    )
    firsts = (
        uw.filter(F.col("cents") > 0)
        .groupBy("user_id")
        .agg(F.min("w").alias("w0"))
    )
    prev = grid.select(
        "user_id", (F.col("w") + 1).alias("w"), F.col("cents").alias("prev")
    )
    min_w = weeks.agg(F.min("w").alias("mw"))
    moves = (
        grid.join(prev, ["user_id", "w"], "left")
        .join(firsts, "user_id", "left")
        .crossJoin(F.broadcast(min_w))
        .filter(F.col("w") > F.col("mw"))
        .select(
            "w",
            "cents",
            F.coalesce("prev", F.lit(0)).alias("prev"),
            F.when(
                (F.col("cents") > 0) & (F.col("w0") == F.col("w")), "new"
            )
            .when(
                (F.col("cents") > 0) & (F.coalesce("prev", F.lit(0)) == 0),
                "resurrected",
            )
            .when(F.col("cents") > F.coalesce("prev", F.lit(0)), "expansion")
            .when(
                (F.col("cents") > 0) & (F.col("cents") < F.col("prev")),
                "contraction",
            )
            .when(
                (F.col("cents") == 0) & (F.coalesce("prev", F.lit(0)) > 0),
                "churned",
            )
            .otherwise("flat")
            .alias("move"),
        )
    )
    return (
        moves.groupBy(F.col("w").alias("week"))
        .agg(
            F.sum("cents").cast("long").alias("rev_cents"),
            F.sum("prev").cast("long").alias("prev_rev_cents"),
            F.sum(
                F.when(F.col("move") == "new", F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("new_rev"),
            F.sum(
                F.when(
                    F.col("move") == "resurrected", F.col("cents")
                ).otherwise(0)
            )
            .cast("long")
            .alias("resurrected_rev"),
            F.sum(
                F.when(
                    F.col("move") == "expansion",
                    F.col("cents") - F.col("prev"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("expansion_rev"),
            F.sum(
                F.when(
                    F.col("move") == "contraction",
                    F.col("prev") - F.col("cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("contraction_rev"),
            F.sum(
                F.when(F.col("move") == "churned", F.col("prev")).otherwise(0)
            )
            .cast("long")
            .alias("churned_rev"),
        )
        .orderBy("week")
    )
