"""Round-7 registry additions, batch 188 — the EDF normality-test suite
(the three classical tests the registry lacked; Jarque-Bera R428 covers
the moment family):

- q_anderson_darling: A² over the purchase-value sample with μ, σ
  estimated (Stephens "case 3"), tie-safe via value-collapsed rank
  blocks — Σ(2i−1) over a tied block is b²−(a−1)², so the EDF sum
  needs one row per DISTINCT cent value, never per observation.
  Ships A², the (1 + 0.75/n + 2.25/n²) small-sample adjustment, and
  the scipy-convention 5% reject bit.
- q_lilliefors: the KS-to-fitted-normal D statistic from the same
  collapsed blocks (sup over both ECDF sides), with the large-n 5%
  critical value 0.886/√n.
- q_shapiro_francia: W′ = (Σ m_i x_(i))² / (Σ m_i² · Σ(x−x̄)²) with
  Blom scores m_i = Φ⁻¹((i−3/8)/(n+1/4)) from the shared BSM probit;
  tied observations make Σ m_i x_(i) order-free within a block, and
  the per-rank scores explode from the block frame.

At 100 TB: the corpus collapses once to distinct cent values — the
[0, 1000) 2-decimal domain bounds that frame at 100,001 rows whatever
the row count — and the one global running-count window runs over
that bounded frame (allowlisted).  Moments are exact integer cent
sums; Φ/Φ⁻¹ are the shared polynomial approximations, so both engines
evaluate identical doubles; outputs round to 6.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext173 import (
    bsm_probit_col,
    bsm_probit_sql,
)
from arrow_supercluster_spark.plans.registry_ext177 import (
    zs_phi_col,
    zs_phi_sql,
)
from arrow_supercluster_spark.sources.tables import read_events

_AD_CRIT_5 = 0.787  # scipy _Avals_norm 5% entry (Stephens 1974)
_LF_CRIT_NUM = 0.886  # large-n Lilliefors 5% numerator

_SQL_VALS = """
      SELECT CAST(round(value * 100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'
"""

_SQL_BLOCKS = f"""
    vals AS ({_SQL_VALS}),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss
      FROM vals
    ),
    dv AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM vals GROUP BY 1),
    cum AS (
      SELECT c, cnt,
             CAST(SUM(cnt) OVER (ORDER BY c) AS BIGINT) AS cb
      FROM dv
    ),
    zed AS (
      SELECT c, cnt, cb, n,
             (c - CAST(s AS DOUBLE) / n)
               / sqrt((ss - CAST(s AS DOUBLE) * s / n) / (n - 1)) AS z
      FROM cum CROSS JOIN stats
    )
"""


def _blocks(spark, sf_dir):
    """(c, cnt, cb, n, z) per distinct cent value — shared EDF scaffold."""
    ev = read_events(spark, sf_dir)
    vals = ev.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    dv = vals.groupBy("c").agg(F.count(F.lit(1)).alias("cnt"))
    # global running count over the value-collapsed frame: bounded by the
    # 100,001 distinct cent values of the [0, 1000) domain (allowlisted)
    cum = dv.select(
        "c", "cnt", F.sum("cnt").over(Window.orderBy("c")).alias("cb")
    )
    z = (F.col("c") - F.col("s").cast("double") / F.col("n")) / F.sqrt(
        (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    return cum.crossJoin(F.broadcast(stats)).select(
        "c", "cnt", "cb", "n", z.alias("z")
    )


# ===========================================================================
# R560 — Anderson-Darling normality test
# ===========================================================================

@register(
    "q_anderson_darling",
    f"""
    WITH {_SQL_BLOCKS},
    terms AS (
      SELECT n,
             (cb * cb - (cb - cnt) * (cb - cnt))
               * ln({zs_phi_sql('z')})
           + (2 * n * cnt - (cb * cb - (cb - cnt) * (cb - cnt)))
               * ln(1.0 - ({zs_phi_sql('z')})) AS term
      FROM zed
    )
    SELECT n,
           round(-n - SUM(term) / n, 6) AS a2,
           round((-n - SUM(term) / n)
                 * (1.0 + 0.75 / n + 2.25 / (n * n)), 6) AS a2_adj,
           (-n - SUM(term) / n)
             > {_AD_CRIT_5} / (1.0 + 4.0 / n - 25.0 / (n * n))
             AS reject_5pct
    FROM terms GROUP BY n
    """,
)
def q_anderson_darling(spark, sf_dir):
    """R560 — A² = −n − (1/n)Σ[(2i−1)lnΦ(z_(i)) + (2n+1−2i)ln(1−Φ(z_(i)))]
    with the tied-block closed form Σ(2i−1) = b²−(a−1)²; μ, σ estimated
    (ddof=1).  reject_5pct follows scipy's convention: A² against
    0.787/(1 + 4/n − 25/n²)."""
    b = _blocks(spark, sf_dir)
    t1 = F.col("cb") * F.col("cb") - (F.col("cb") - F.col("cnt")) * (
        F.col("cb") - F.col("cnt")
    )
    phi = zs_phi_col(F.col("z"))
    term = t1 * F.log(phi) + (2 * F.col("n") * F.col("cnt") - t1) * F.log(
        1.0 - phi
    )
    return (
        b.withColumn("term", term)
        .groupBy("n")
        .agg(F.sum("term").alias("tsum"))
        .select(
            "n",
            F.round(
                -F.col("n") - F.col("tsum") / F.col("n"), 6
            ).alias("a2"),
            F.round(
                (-F.col("n") - F.col("tsum") / F.col("n"))
                * (
                    1.0
                    + 0.75 / F.col("n")
                    + 2.25 / (F.col("n") * F.col("n"))
                ),
                6,
            ).alias("a2_adj"),
            (
                (-F.col("n") - F.col("tsum") / F.col("n"))
                > _AD_CRIT_5
                / (
                    1.0
                    + 4.0 / F.col("n")
                    - 25.0 / (F.col("n") * F.col("n"))
                )
            ).alias("reject_5pct"),
        )
    )


# ===========================================================================
# R561 — Lilliefors (KS to fitted normal)
# ===========================================================================

@register(
    "q_lilliefors",
    f"""
    WITH {_SQL_BLOCKS},
    gaps AS (
      SELECT n,
             GREATEST(CAST(cb AS DOUBLE) / n - ({zs_phi_sql('z')}),
                      ({zs_phi_sql('z')})
                        - CAST(cb - cnt AS DOUBLE) / n) AS gap
      FROM zed
    )
    SELECT n, round(MAX(gap), 6) AS d_stat,
           round({_LF_CRIT_NUM} / sqrt(n), 6) AS crit_5pct,
           MAX(gap) > {_LF_CRIT_NUM} / sqrt(n) AS reject_5pct
    FROM gaps GROUP BY n
    """,
)
def q_lilliefors(spark, sf_dir):
    """R561 — D = sup|F̂ − Φ((x−μ̂)/σ̂)| over both ECDF sides of each
    tied block; 5% critical value 0.886/√n (large-n approximation,
    stated).  Same collapsed-block scaffold as R560."""
    b = _blocks(spark, sf_dir)
    phi = zs_phi_col(F.col("z"))
    gap = F.greatest(
        F.col("cb").cast("double") / F.col("n") - phi,
        phi - (F.col("cb") - F.col("cnt")).cast("double") / F.col("n"),
    )
    return (
        b.withColumn("gap", gap)
        .groupBy("n")
        .agg(F.max("gap").alias("d"))
        .select(
            "n",
            F.round("d", 6).alias("d_stat"),
            F.round(_LF_CRIT_NUM / F.sqrt("n"), 6).alias("crit_5pct"),
            (F.col("d") > _LF_CRIT_NUM / F.sqrt("n")).alias(
                "reject_5pct"
            ),
        )
    )


# ===========================================================================
# R562 — Shapiro-Francia W′
# ===========================================================================

@register(
    "q_shapiro_francia",
    f"""
    WITH {_SQL_BLOCKS},
    ranked AS (
      SELECT c, n, unnest(range(cb - cnt + 1, cb + 1)) AS i
      FROM zed
    ),
    scored AS (
      SELECT c, n,
             {bsm_probit_sql('((i - 0.375) / (n + 0.25))')} AS m
      FROM ranked
    ),
    sums AS (
      SELECT n,
             SUM(m * c) AS smx,
             SUM(m * m) AS sm2
      FROM scored GROUP BY n
    )
    SELECT s.n,
           round(smx * smx
                 / (sm2 * (ss - CAST(st.s AS DOUBLE) * st.s / st.n)), 6)
             AS w_prime
    FROM sums s CROSS JOIN (SELECT * FROM stats) st
    """,
)
def q_shapiro_francia(spark, sf_dir):
    """R562 — W′ = (Σ m_i x_(i))² / (Σ m_i² · Σ(x−x̄)²), Blom scores
    m_i = Φ⁻¹((i−3/8)/(n+1/4)) via the shared BSM probit.  Ranks
    explode from the tied blocks (Σ m_i·x over a block is order-free),
    so no per-observation window exists anywhere."""
    ev = read_events(spark, sf_dir)
    vals = ev.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100).cast("long").alias("c")
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    b = _blocks(spark, sf_dir)
    ranked = b.select(
        "c",
        "n",
        F.explode(
            F.sequence(F.col("cb") - F.col("cnt") + 1, F.col("cb"))
        ).alias("i"),
    )
    m = bsm_probit_col((F.col("i") - 0.375) / (F.col("n") + 0.25))
    sums = (
        ranked.withColumn("m", m)
        .groupBy("n")
        .agg(
            F.sum(F.col("m") * F.col("c")).alias("smx"),
            F.sum(F.col("m") * F.col("m")).alias("sm2"),
        )
    )
    sxx = F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col(
        "stats_n"
    )
    return (
        sums.crossJoin(
            F.broadcast(
                stats.select(
                    F.col("n").alias("stats_n"), "s", "ss"
                )
            )
        )
        .select(
            "n",
            F.round(
                F.col("smx") * F.col("smx") / (F.col("sm2") * sxx), 6
            ).alias("w_prime"),
        )
    )
