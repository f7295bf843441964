"""Round-7 registry additions, batch 198 — inventory economics over the
TPC-H slice (the supply-chain readouts of the sales tables):

- q_abc_classification: Pareto ABC classes of parts by revenue —
  cumulative revenue share over the revenue-ranked part frame, A ≤ 80%,
  B ≤ 95%, C the tail (integer-exact boundary cuts 100·cum ≤ 80·total).
  The part rank is a distributed zip_scan with its exact-order running
  revenue sum (functions/distrank.py) — the SQL twin keeps its
  SUM-OVER form while the Spark plan stays partition-parallel.
- q_eoq_policy: the economic order quantity √(2DS/H) per part type
  (S = $100 ordering cost stated, H = 20% of the type's mean retail
  price), plus the (z=1.645, L=7 days) safety stock z·σ_d·√L and
  reorder point μ_d·L + ss over demand-day statistics.
- q_demand_classification: the Syntetos-Boylan quadrants per part
  type — ADI (calendar days / demand days) × CV² of nonzero daily
  demand (ddof=1) against the published 1.32 / 0.49 cutoffs:
  smooth / intermittent / erratic / lumpy.

At 100 TB: revenue folds as exact cents; the ABC rank is the
distributed zip_scan (no global window in the Spark plan); EOQ and
the demand quadrants collapse lineitem once to (type, day) — bounded
by |types| × calendar.  Outputs round to 4-6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_ABC_A, _ABC_B = 80, 95  # cumulative-share percent cuts
_EOQ_S = 100.0  # ordering cost, dollars (stated)
_EOQ_HOLD = 0.2  # holding rate vs mean retail price (stated)
_SS_Z = 1.645  # 95% service level
_SS_LEAD = 7  # days (stated)
_SB_ADI, _SB_CV2 = 1.32, 0.49  # Syntetos-Boylan cutoffs

_SQL_REV_CENTS = (
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
)


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _rev_cents_col():
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")


# ===========================================================================
# R590 — ABC (Pareto) classification of parts by revenue
# ===========================================================================

@register(
    "q_abc_classification",
    f"""
    WITH pr AS (
      SELECT l_partkey, CAST(SUM({_SQL_REV_CENTS}) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS t FROM pr),
    ranked AS (
      SELECT l_partkey, rev,
             CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey)
                  AS BIGINT) AS cum
      FROM pr
    ),
    classed AS (
      SELECT CASE WHEN 100 * cum <= {_ABC_A} * t THEN 'A'
                  WHEN 100 * cum <= {_ABC_B} * t THEN 'B'
                  ELSE 'C' END AS abc_class,
             rev
      FROM ranked CROSS JOIN tot
    )
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(SUM(rev) / 100.0, 2) AS revenue,
           round(SUM(rev) * 1.0 / MAX(t), 6) AS revenue_share
    FROM classed CROSS JOIN tot
    GROUP BY 1 ORDER BY 1
    """,
)
def q_abc_classification(spark, sf_dir):
    """R590 — parts ranked by revenue (exact cents), classes cut at
    the 80/95 cumulative shares with integer-exact comparisons.  The
    Spark rank+running-sum is zip_scan (distributed; the |parts|
    dimension never funnels through one reducer) — cumsum of
    integer-valued doubles stays exact below 2^53."""
    from arrow_supercluster_spark.functions.distrank import zip_scan

    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(_rev_cents_col()).alias("rev")
    )
    ranked, n, tot = zip_scan(
        pr.withColumn("rev_d", F.col("rev").cast("double")),
        [F.col("rev").desc(), "l_partkey"],
        out="_rk",
        scan_col="rev_d",
        scan_out="cum",
    )
    classed = ranked.select(
        "rev",
        F.when(100 * F.col("cum") <= _ABC_A * tot, "A")
        .when(100 * F.col("cum") <= _ABC_B * tot, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev") / 100.0, 2).alias("revenue"),
            F.round(F.sum("rev") * 1.0 / tot, 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("abc_class")
    )


# ===========================================================================
# R591 — EOQ + safety stock per part type
# ===========================================================================

@register(
    "q_eoq_policy",
    f"""
    WITH li AS (
      SELECT p.p_type, CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(l.l_shipdate AS DATE) AS d
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    demand AS (
      SELECT p_type, CAST(SUM(qty) AS BIGINT) AS d_total FROM li
      GROUP BY 1
    ),
    holding AS (
      SELECT p_type,
             {_EOQ_HOLD} * SUM(CAST(round(p_retailprice * 100)
                                    AS BIGINT)) / 100.0 / COUNT(*)
               AS h
      FROM part GROUP BY 1
    ),
    daily AS (
      SELECT p_type, d, CAST(SUM(qty) AS BIGINT) AS dq
      FROM li GROUP BY 1, 2
    ),
    dstats AS (
      SELECT p_type, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(dq) AS BIGINT) AS s,
             CAST(SUM(dq * dq) AS BIGINT) AS ss
      FROM daily GROUP BY 1
    )
    SELECT dm.p_type, dm.d_total,
           round(sqrt(2.0 * dm.d_total * {_EOQ_S} / h.h), 4) AS eoq,
           round({_SS_Z} * sqrt((ds.ss - CAST(ds.s AS DOUBLE) * ds.s
                                 / ds.nd) / (ds.nd - 1))
                 * sqrt({_SS_LEAD}.0), 4) AS safety_stock,
           round(CAST(ds.s AS DOUBLE) / ds.nd * {_SS_LEAD}
                 + {_SS_Z} * sqrt((ds.ss - CAST(ds.s AS DOUBLE) * ds.s
                                   / ds.nd) / (ds.nd - 1))
                   * sqrt({_SS_LEAD}.0), 4) AS reorder_point
    FROM demand dm
    JOIN holding h ON h.p_type = dm.p_type
    JOIN dstats ds ON ds.p_type = dm.p_type
    ORDER BY dm.p_type
    """,
)
def q_eoq_policy(spark, sf_dir):
    """R591 — EOQ = √(2DS/H) per type (H = 20% of the type's mean
    retail price), safety stock z·σ_daily·√L over DEMAND days (stated
    convention), reorder point μ_daily·L + ss.  All moments fold
    exact integers (quantities, retail cents)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "part").select(
                    "p_partkey", "p_type"
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            "p_type",
            F.col("l_quantity").cast("long").alias("qty"),
            F.to_date("l_shipdate").alias("d"),
        )
    )
    demand = li.groupBy("p_type").agg(F.sum("qty").alias("d_total"))
    holding = (
        _t(spark, sf_dir, "part")
        .groupBy("p_type")
        .agg(
            (
                _EOQ_HOLD
                * F.sum(
                    F.round(F.col("p_retailprice") * 100).cast("long")
                )
                / 100.0
                / F.count(F.lit(1))
            ).alias("h")
        )
    )
    daily = li.groupBy("p_type", "d").agg(F.sum("qty").alias("dq"))
    dstats = daily.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dq").alias("s"),
        F.sum(F.col("dq") * F.col("dq")).alias("ss"),
    )
    sd = F.sqrt(
        (
            F.col("ss")
            - F.col("s").cast("double") * F.col("s") / F.col("nd")
        )
        / (F.col("nd") - 1)
    )
    ss_col = _SS_Z * sd * F.sqrt(F.lit(float(_SS_LEAD)))
    return (
        demand.join(F.broadcast(holding), "p_type")
        .join(F.broadcast(dstats), "p_type")
        .select(
            "p_type",
            "d_total",
            F.round(
                F.sqrt(2.0 * F.col("d_total") * _EOQ_S / F.col("h")), 4
            ).alias("eoq"),
            F.round(ss_col, 4).alias("safety_stock"),
            F.round(
                F.col("s").cast("double") / F.col("nd") * _SS_LEAD
                + ss_col,
                4,
            ).alias("reorder_point"),
        )
        .orderBy("p_type")
    )


# ===========================================================================
# R592 — Syntetos-Boylan demand classification
# ===========================================================================

@register(
    "q_demand_classification",
    f"""
    WITH li AS (
      SELECT p.p_type, CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(l.l_shipdate AS DATE) AS d
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    cal AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n_cal FROM li),
    daily AS (
      SELECT p_type, d, CAST(SUM(qty) AS BIGINT) AS dq
      FROM li GROUP BY 1, 2
    ),
    stats AS (
      SELECT p_type, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(SUM(dq) AS BIGINT) AS s,
             CAST(SUM(dq * dq) AS BIGINT) AS ss
      FROM daily GROUP BY 1
    ),
    scored AS (
      SELECT p_type,
             CAST(n_cal AS DOUBLE) / nd AS adi,
             ((ss - CAST(s AS DOUBLE) * s / nd) / (nd - 1))
               / ((CAST(s AS DOUBLE) / nd) * (CAST(s AS DOUBLE) / nd))
               AS cv2
      FROM stats CROSS JOIN cal
    )
    SELECT p_type, round(adi, 4) AS adi, round(cv2, 4) AS cv2,
           CASE WHEN adi < {_SB_ADI} AND cv2 < {_SB_CV2} THEN 'smooth'
                WHEN adi >= {_SB_ADI} AND cv2 < {_SB_CV2}
                  THEN 'intermittent'
                WHEN adi < {_SB_ADI} THEN 'erratic'
                ELSE 'lumpy' END AS demand_class
    FROM scored ORDER BY p_type
    """,
)
def q_demand_classification(spark, sf_dir):
    """R592 — ADI = calendar demand days / type demand days, CV² of
    nonzero daily demand (ddof=1) over mean², quadrants at the
    published (1.32, 0.49) cutoffs — the forecastability screen that
    routes types to Croston (R446) vs standard smoothing."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "part").select(
                    "p_partkey", "p_type"
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            "p_type",
            F.col("l_quantity").cast("long").alias("qty"),
            F.to_date("l_shipdate").alias("d"),
        )
    )
    cal = li.agg(F.countDistinct("d").alias("n_cal"))
    daily = li.groupBy("p_type", "d").agg(F.sum("qty").alias("dq"))
    stats = daily.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("dq").alias("s"),
        F.sum(F.col("dq") * F.col("dq")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("nd")
    var = (
        F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("nd")
    ) / (F.col("nd") - 1)
    scored = stats.crossJoin(F.broadcast(cal)).select(
        "p_type",
        (F.col("n_cal").cast("double") / F.col("nd")).alias("adi"),
        (var / (mean * mean)).alias("cv2"),
    )
    return scored.select(
        "p_type",
        F.round("adi", 4).alias("adi"),
        F.round("cv2", 4).alias("cv2"),
        F.when(
            (F.col("adi") < _SB_ADI) & (F.col("cv2") < _SB_CV2),
            "smooth",
        )
        .when(
            (F.col("adi") >= _SB_ADI) & (F.col("cv2") < _SB_CV2),
            "intermittent",
        )
        .when(F.col("adi") < _SB_ADI, "erratic")
        .otherwise("lumpy")
        .alias("demand_class"),
    ).orderBy("p_type")
