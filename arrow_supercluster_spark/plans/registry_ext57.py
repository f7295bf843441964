"""Round-2 registry additions, batch 52 — iterative-ML steps in closed
relational form:

- q_gmm_em_step: ONE EM iteration for a 2-component 1-D Gaussian
  mixture over event values (fixed literal initialization) —
  responsibilities are a narrow map, the M-step is one aggregate;
- q_ols_2var: 2-feature OLS (spend ~ frequency + entropy) solved in
  closed form from the normal equations — coefficients and R² without
  any iterative solver.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# GMM EM step
# ===========================================================================

# fixed initialization (literals in the plan — k-means-seed-scale state)
_MU1, _MU2 = 20.0, 80.0
_SD1, _SD2 = 15.0, 15.0
_W1 = 0.5

_SQL_PDF1 = f"(exp(-((value - {_MU1}) * (value - {_MU1})) / (2.0 * {_SD1 * _SD1})) / {_SD1})"
_SQL_PDF2 = f"(exp(-((value - {_MU2}) * (value - {_MU2})) / (2.0 * {_SD2 * _SD2})) / {_SD2})"


@register(
    "q_gmm_em_step",
    f"""
    WITH r AS (
      SELECT value,
             ({_W1} * {_SQL_PDF1})
               / ({_W1} * {_SQL_PDF1} + (1.0 - {_W1}) * {_SQL_PDF2}) AS g1
      FROM events WHERE value IS NOT NULL
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(g1) AS sg,
             SUM(g1 * value) / SUM(g1) AS mu1,
             SUM((1.0 - g1) * value) / SUM(1.0 - g1) AS mu2
      FROM r
    )
    SELECT m.n,
           round(m.sg / m.n, 6) AS w1_new,
           round(m.mu1, 6) AS mu1_new,
           round(m.mu2, 6) AS mu2_new,
           round(sqrt(SUM(r.g1 * (r.value - m.mu1) * (r.value - m.mu1)) / m.sg), 6)
             AS sd1_new
    FROM r CROSS JOIN m
    GROUP BY m.n, m.sg, m.mu1, m.mu2
    """,
)
def q_gmm_em_step(spark, sf_dir):
    """ML step — one EM iteration of a 2-component 1-D Gaussian mixture
    on event values from a fixed literal initialization: the E-step
    (responsibilities γ) is a narrow exp map, the M-step (new weight,
    means, σ₁) is one aggregate — the per-iteration shape of the
    standard driver loop (q_kmeans_step / q_pagerank discipline; the
    loop itself is the caller's). σ needs the freshly-updated mean, so the
    M-step is two chained aggregates (moments, then weighted spread); outputs round to 6 (engine sum
    order)."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    v = F.col("value")
    pdf1 = F.exp(-((v - _MU1) * (v - _MU1)) / (2.0 * _SD1 * _SD1)) / _SD1
    pdf2 = F.exp(-((v - _MU2) * (v - _MU2)) / (2.0 * _SD2 * _SD2)) / _SD2
    g1 = (_W1 * pdf1) / (_W1 * pdf1 + (1.0 - _W1) * pdf2)
    r = ev.select("value", g1.alias("g1"))
    m = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g1").alias("sg"),
        (F.sum(F.col("g1") * F.col("value")) / F.sum("g1")).alias("mu1"),
        (
            F.sum((1.0 - F.col("g1")) * F.col("value")) / F.sum(1.0 - F.col("g1"))
        ).alias("mu2"),
    )
    return (
        r.crossJoin(F.broadcast(m))
        .groupBy("n", "sg", "mu1", "mu2")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(
                        F.col("g1")
                        * (F.col("value") - F.col("mu1"))
                        * (F.col("value") - F.col("mu1"))
                    )
                    / F.col("sg")
                ),
                6,
            ).alias("sd1_new")
        )
        .select(
            "n",
            F.round(F.col("sg") / F.col("n"), 6).alias("w1_new"),
            F.round("mu1", 6).alias("mu1_new"),
            F.round("mu2", 6).alias("mu2_new"),
            "sd1_new",
        )
    )


# ===========================================================================
# Closed-form 2-variable OLS
# ===========================================================================

@register(
    "q_ols_2var",
    """
    WITH f AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS x1,
             round(SUM(value), 4) AS y
      FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    mix AS (
      SELECT user_id, event_type, COUNT(*) AS c FROM events
      WHERE value IS NOT NULL GROUP BY 1, 2
    ),
    ent AS (
      SELECT m.user_id,
             -SUM((c * 1.0 / f.x1) * ln(c * 1.0 / f.x1)) AS x2
      FROM mix m JOIN f USING (user_id) GROUP BY m.user_id
    ),
    d AS (
      SELECT f.x1 - AVG(f.x1) OVER () AS dx1,
             e.x2 - AVG(e.x2) OVER () AS dx2,
             f.y - AVG(f.y) OVER () AS dy
      FROM f JOIN ent e USING (user_id)
    ),
    s AS (
      SELECT SUM(dx1 * dx1) AS s11, SUM(dx1 * dx2) AS s12,
             SUM(dx2 * dx2) AS s22,
             SUM(dx1 * dy) AS s1y, SUM(dx2 * dy) AS s2y,
             SUM(dy * dy) AS syy, COUNT(*) AS n
      FROM d
    )
    SELECT n,
           round((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 6) AS b1,
           round((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 6) AS b2,
           round(((s22 * s1y - s12 * s2y) * s1y
                  + (s11 * s2y - s12 * s1y) * s2y)
                 / ((s11 * s22 - s12 * s12) * syy), 6) AS r2
    FROM s
    """,
)
def q_ols_2var(spark, sf_dir):
    """ML step — two-feature OLS in closed form: spend regressed on
    event frequency and behavioral entropy via the 2×2 normal equations
    (centered sums → Cramer's rule) — coefficients and R² with NO
    iterative solver, one pass of moment sums after the user collapse.
    The moment matrix is 5 numbers however large the data — the
    textbook 'aggregate then solve tiny system on the driver' pattern,
    here solved inside the query. Outputs round to 6."""
    ev = read_events(spark, sf_dir).filter(F.col("value").isNotNull())
    f = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("x1"),
        F.round(F.sum("value"), 4).alias("y"),
    )
    mix = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c") * 1.0 / F.col("x1")
    ent = (
        mix.join(f.select("user_id", "x1"), "user_id")
        .groupBy("user_id")
        .agg((-F.sum(p * F.log(p))).alias("x2"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy()
    joined = f.join(ent, "user_id")
    d = joined.select(
        (F.col("x1") - F.avg("x1").over(w)).alias("dx1"),
        (F.col("x2") - F.avg("x2").over(w)).alias("dx2"),
        (F.col("y") - F.avg("y").over(w)).alias("dy"),
    )
    s = d.agg(
        F.sum(F.col("dx1") * F.col("dx1")).alias("s11"),
        F.sum(F.col("dx1") * F.col("dx2")).alias("s12"),
        F.sum(F.col("dx2") * F.col("dx2")).alias("s22"),
        F.sum(F.col("dx1") * F.col("dy")).alias("s1y"),
        F.sum(F.col("dx2") * F.col("dy")).alias("s2y"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.count(F.lit(1)).alias("n"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    r2 = (
        (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) * F.col("s1y")
        + (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) * F.col("s2y")
    ) / (det * F.col("syy"))
    return s.select(
        "n",
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(r2, 6).alias("r2"),
    )
