"""Round-7 registry additions, batch 199 — multiple-testing family
completion + robust time-series anomaly screens:

- q_holm_adjust: the FWER side of what q_bh_fdr (R) does for FDR, on
  the SAME per-type conversion z-test p-values: Bonferroni and Šidák
  single-step, Holm step-down (p̃_(i) = max_{j≤i} min(1,(m−j+1)p_(j)))
  and Hochberg step-up adjusted p-values, with 5% reject bits.  All
  step logic runs as bounded self-joins on the m=|types| ranked frame.
- q_seasonal_esd: generalized ESD (Rosner) on the weekday-median-
  detrended daily purchase series — three unrolled remove-the-max
  iterations (the S-H-ESD shape with a STATED z > 3.0 significance
  rule in place of the t-quantile λ), each reporting the removed day,
  its z, and the significance bit.
- q_hampel_filter: the rolling Hampel outlier screen — per day the
  ±3-day window median and MAD, flag |x − med| > 3·1.4826·MAD — the
  standard robust cleaning pass before any forecasting.

At 100 TB: everything here runs on corpus collapses (per-type user
conversions; daily counts); the iteration/window machinery is bounded
self-joins and ≤3 unrolled passes.  Medians are exact interpolated
quantiles of integers (k/2-exact in double); p-values share the A&S
erf polynomial with q_bh_fdr.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext101 import (
    _erf_col,
    _sql_erf,
)
from arrow_supercluster_spark.sources.tables import read_events

_MT_ALPHA = 0.05
_ESD_K = 3
_ESD_Z = 3.0
_HF_RADIUS = 3
_HF_K = 3.0
_HF_SCALE = 1.4826

_SQL_PVALS = f"""
    assign AS (
      SELECT event_type, user_id,
             MAX(CASE WHEN value > 90 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1, 2
    ),
    grp AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS k
      FROM assign GROUP BY 1
    ),
    pool AS (SELECT SUM(k) * 1.0 / SUM(n) AS p0 FROM grp),
    z AS (
      SELECT g.event_type,
             abs((g.k * 1.0 / g.n - p.p0)
                 / sqrt(p.p0 * (1 - p.p0) * (1.0 / g.n))) AS az
      FROM grp g CROSS JOIN pool p
    ),
    pv AS (
      SELECT event_type,
             2 * (1 - 0.5 * (1 + {_sql_erf('(az / sqrt(2.0))')})) AS p
      FROM z
    ),
    ranked AS (
      SELECT a.event_type, a.p,
             CAST(COUNT(*) AS BIGINT) AS rnk
      FROM pv a JOIN pv b
        ON b.p < a.p OR (b.p = a.p AND b.event_type <= a.event_type)
      GROUP BY 1, 2
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pv)
"""


def _spark_pvals(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    assign = ev.groupBy("event_type", "user_id").agg(
        F.max(F.when(F.col("value") > 90, 1).otherwise(0)).alias("conv")
    )
    grp = assign.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    pool = grp.agg(
        (F.sum("k") * 1.0 / F.sum("n")).alias("p0")
    )
    z = grp.crossJoin(F.broadcast(pool)).select(
        "event_type",
        F.abs(
            (F.col("k") * 1.0 / F.col("n") - F.col("p0"))
            / F.sqrt(
                F.col("p0") * (1 - F.col("p0")) * (1.0 / F.col("n"))
            )
        ).alias("az"),
    )
    pv = z.select(
        "event_type",
        (
            2
            * (
                1
                - 0.5
                * (1 + _erf_col(F.col("az") / F.sqrt(F.lit(2.0))))
            )
        ).alias("p"),
    )
    b = pv.select(F.col("event_type").alias("bt"), F.col("p").alias("bp"))
    ranked = (
        pv.join(
            b,
            (F.col("bp") < F.col("p"))
            | (
                (F.col("bp") == F.col("p"))
                & (F.col("bt") <= F.col("event_type"))
            ),
        )
        .groupBy("event_type", "p")
        .agg(F.count(F.lit(1)).alias("rnk"))
    )
    m = pv.agg(F.count(F.lit(1)).alias("m"))
    return ranked, m


# ===========================================================================
# R593 — Bonferroni / Sidak / Holm / Hochberg adjusted p-values
# ===========================================================================

@register(
    "q_holm_adjust",
    f"""
    WITH {_SQL_PVALS},
    steps AS (
      SELECT a.event_type, a.p, a.rnk, m.m,
             MAX(LEAST(1.0, (m.m - b.rnk + 1) * b.p)) AS p_holm
      FROM ranked a JOIN ranked b ON b.rnk <= a.rnk CROSS JOIN m
      GROUP BY 1, 2, 3, 4
    ),
    hoch AS (
      SELECT a.event_type,
             MIN(LEAST(1.0, (s.m - b.rnk + 1) * b.p)) AS p_hochberg
      FROM ranked a
      JOIN ranked b ON b.rnk >= a.rnk
      CROSS JOIN m s
      GROUP BY 1
    )
    SELECT s.event_type, round(s.p, 8) AS p_raw,
           round(LEAST(1.0, s.m * s.p), 8) AS p_bonferroni,
           round(1.0 - power(1.0 - s.p, s.m), 8) AS p_sidak,
           round(s.p_holm, 8) AS p_holm,
           round(h.p_hochberg, 8) AS p_hochberg,
           s.p_holm < {_MT_ALPHA} AS reject_holm,
           h.p_hochberg < {_MT_ALPHA} AS reject_hochberg
    FROM steps s JOIN hoch h ON h.event_type = s.event_type
    ORDER BY s.event_type
    """,
)
def q_holm_adjust(spark, sf_dir):
    """R593 — FWER-adjusted p-values on the q_bh_fdr hypothesis family:
    Bonferroni m·p, Šidák 1−(1−p)^m, Holm step-down running max,
    Hochberg step-up running min — both steps as bounded rank
    self-joins on the m=|types| frame."""
    ranked, m = _spark_pvals(spark, sf_dir)
    b = ranked.select(
        F.col("rnk").alias("brnk"), F.col("p").alias("bp")
    )
    steps = (
        ranked.join(F.broadcast(b), F.col("brnk") <= F.col("rnk"))
        .crossJoin(F.broadcast(m))
        .groupBy("event_type", "p", "rnk", "m")
        .agg(
            F.max(
                F.least(
                    F.lit(1.0),
                    (F.col("m") - F.col("brnk") + 1) * F.col("bp"),
                )
            ).alias("p_holm")
        )
    )
    hoch = (
        ranked.join(F.broadcast(b), F.col("brnk") >= F.col("rnk"))
        .crossJoin(F.broadcast(m))
        .groupBy("event_type")
        .agg(
            F.min(
                F.least(
                    F.lit(1.0),
                    (F.col("m") - F.col("brnk") + 1) * F.col("bp"),
                )
            ).alias("p_hochberg")
        )
    )
    return (
        steps.join(
            hoch.select(
                F.col("event_type").alias("ht"), "p_hochberg"
            ),
            F.col("ht") == F.col("event_type"),
        )
        .select(
            "event_type",
            F.round("p", 8).alias("p_raw"),
            F.round(
                F.least(F.lit(1.0), F.col("m") * F.col("p")), 8
            ).alias("p_bonferroni"),
            F.round(
                1.0 - F.pow(1.0 - F.col("p"), F.col("m")), 8
            ).alias("p_sidak"),
            F.round("p_holm", 8).alias("p_holm"),
            F.round("p_hochberg", 8).alias("p_hochberg"),
            (F.col("p_holm") < _MT_ALPHA).alias("reject_holm"),
            (F.col("p_hochberg") < _MT_ALPHA).alias("reject_hochberg"),
        )
        .orderBy("event_type")
    )


# ===========================================================================
# R594 — generalized ESD on the weekday-detrended daily series
# ===========================================================================

def _sql_esd() -> str:
    ctes = [
        """daily AS (
      SELECT CAST(ts AS DATE) AS d,
             EXTRACT(dow FROM CAST(ts AS DATE)) AS wd,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )""",
        """wmed AS (
      SELECT wd, quantile_cont(x, 0.5) AS med FROM daily GROUP BY 1
    )""",
        """resid0 AS (
      SELECT d.d, d.x, d.x - w.med AS r
      FROM daily d JOIN wmed w ON w.wd = d.wd
    )""",
    ]
    rows = []
    for i in range(1, _ESD_K + 1):
        prev = f"resid{i - 1}"
        ctes.append(
            f"""st{i} AS (
      SELECT COUNT(*) AS n, AVG(r) AS mu,
             sqrt((SUM(r * r) - SUM(r) * SUM(r) / COUNT(*))
                  / (COUNT(*) - 1)) AS sd
      FROM {prev}
    )"""
        )
        ctes.append(
            f"""cand{i} AS (
      SELECT p.d, p.x, abs(p.r - s.mu) / s.sd AS z
      FROM {prev} p CROSS JOIN st{i} s
      ORDER BY abs(p.r - s.mu) / s.sd DESC, p.d LIMIT 1
    )"""
        )
        ctes.append(
            f"""resid{i} AS (
      SELECT p.* FROM {prev} p
      WHERE p.d <> (SELECT d FROM cand{i})
    )"""
        )
        rows.append(
            f"SELECT {i} AS iteration, strftime(d, '%Y-%m-%d') AS day,"
            f" x, round(z, 4) AS z, z > {_ESD_Z} AS significant"
            f" FROM cand{i}"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + " UNION ALL ".join(rows)
        + "\n    ORDER BY iteration"
    )


@register("q_seasonal_esd", _sql_esd())
def q_seasonal_esd(spark, sf_dir):
    """R594 — generalized ESD, 3 unrolled iterations: weekday-median
    detrend, per pass compute (μ, σ, ddof=1) of the remaining
    residuals, remove the max-|z| day (earliest on ties), flag
    z > 3.0 (stated rule in place of Rosner's t-quantile λ)."""
    ev = read_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.to_date("ts").alias("d"),
            F.dayofweek("ts").alias("wd_spark"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wmed = daily.groupBy("wd_spark").agg(
        F.expr("percentile(x, 0.5)").alias("med")
    )
    from arrow_supercluster_spark.functions.checkpoint import truncate

    # materialize the <=31-row residual frame once: without the cut the
    # three unrolled passes would each re-scan the corpus
    resid = truncate(
        daily.join(F.broadcast(wmed), "wd_spark").select(
            "d", "x", (F.col("x") - F.col("med")).alias("r")
        )
    )
    outs = []
    for i in range(1, _ESD_K + 1):
        st = resid.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("r").alias("mu"),
            F.sqrt(
                (
                    F.sum(F.col("r") * F.col("r"))
                    - F.sum("r") * F.sum("r") / F.count(F.lit(1))
                )
                / (F.count(F.lit(1)) - 1)
            ).alias("sd"),
        )
        cand = (
            resid.crossJoin(F.broadcast(st))
            .select(
                "d",
                "x",
                (F.abs(F.col("r") - F.col("mu")) / F.col("sd")).alias(
                    "z"
                ),
            )
            .orderBy(F.desc("z"), F.asc("d"))
            .limit(1)
        )
        outs.append(
            cand.select(
                F.lit(i).alias("iteration"),
                F.date_format("d", "yyyy-MM-dd").alias("day"),
                "x",
                F.round("z", 4).alias("z"),
                (F.col("z") > _ESD_Z).alias("significant"),
            )
        )
        cd = cand.select(F.col("d").alias("cd"))
        resid = resid.join(
            F.broadcast(cd), F.col("cd") == F.col("d"), "left_anti"
        )
    out = outs[0]
    for p in outs[1:]:
        out = out.unionByName(p)
    return out.orderBy("iteration")


# ===========================================================================
# R595 — rolling Hampel outlier filter
# ===========================================================================

@register(
    "q_hampel_filter",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    med AS (
      SELECT a.d, MAX(a.x) AS x, quantile_cont(b.x, 0.5) AS med
      FROM daily a JOIN daily b
        ON abs(CAST(b.d - a.d AS BIGINT)) <= {_HF_RADIUS}
      GROUP BY a.d
    ),
    mad AS (
      SELECT m.d, MAX(m.x) AS x, MAX(m.med) AS med,
             quantile_cont(abs(b.x - m.med), 0.5) AS mad
      FROM med m JOIN daily b
        ON abs(CAST(b.d - m.d AS BIGINT)) <= {_HF_RADIUS}
      GROUP BY m.d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, x,
           round(med, 4) AS med, round(mad, 4) AS mad,
           abs(x - med) > {_HF_K} * {_HF_SCALE} * mad AS is_outlier
    FROM mad ORDER BY day
    """,
)
def q_hampel_filter(spark, sf_dir):
    """R595 — per day the ±3-day window median and the MAD of the
    window around THAT median; outlier iff |x − med| > 3·1.4826·MAD.
    Two bounded band self-joins on the day frame; medians are exact
    interpolated quantiles of integers."""
    ev = read_events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    b = daily.select(F.col("d").alias("bd"), F.col("x").alias("bx"))
    med = (
        daily.join(
            b, F.abs(F.datediff(F.col("bd"), F.col("d"))) <= _HF_RADIUS
        )
        .groupBy("d")
        .agg(
            F.max("x").alias("x"),
            F.expr("percentile(bx, 0.5)").alias("med"),
        )
    )
    m2 = med.select(
        F.col("d").alias("md"), F.col("x").alias("mx"), "med"
    )
    mad = (
        m2.join(
            b, F.abs(F.datediff(F.col("bd"), F.col("md"))) <= _HF_RADIUS
        )
        .groupBy("md")
        .agg(
            F.max("mx").alias("x"),
            F.max("med").alias("med"),
            F.expr("percentile(abs(bx - med), 0.5)").alias("mad"),
        )
    )
    return mad.select(
        F.date_format("md", "yyyy-MM-dd").alias("day"),
        "x",
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        (
            F.abs(F.col("x") - F.col("med"))
            > _HF_K * _HF_SCALE * F.col("mad")
        ).alias("is_outlier"),
    ).orderBy("day")
