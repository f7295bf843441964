"""Round-8 registry additions, batch 213 — time-series complexity and
random-walk diagnostics on the daily event-count series (the
calendar-bounded frame every control-chart query shares):

- q_permutation_entropy: Bandt-Pompe ordinal-pattern entropy at m=3 —
  the distribution of rank patterns of consecutive value triples;
  maximal (ln 6) for white noise, low for monotone/periodic structure.
  Ties break by position (the standard convention, stated).
- q_sample_entropy: SampEn(m=2, r=0.2σ) — −ln(A/B) where B counts
  m-window matches (Chebyshev distance ≤ r) and A counts (m+1)-window
  matches, self-matches excluded.  The regularity statistic; the ≤31²
  pair frame is calendar-bounded.
- q_kpss_level: the KPSS level-stationarity test — partial-sum
  statistic over the demeaned series with a Bartlett-kernel long-run
  variance (l=3), 5% asymptotic critical value 0.463.  The null is
  STATIONARITY (the complement of unit-root tests); reads alongside
  the existing q_variance_ratio / q_hurst_rs.

At 100 TB: all three collapse the corpus to ≤31 daily rows with one
keyed agg; the pattern/pair/overlap work is literal-bounded above it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_PE_M = 3
_SE_M = 2
_SE_R_FRAC = 0.2
_KPSS_L = 3
_KPSS_CRIT_5 = 0.463

_SQL_DAILY = """
    daily AS MATERIALIZED (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT c, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily
    )"""


def _spark_daily(spark, sf_dir):
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("day")  # calendar-bounded: ≤31 rows
    return daily.select(
        "c", F.row_number().over(w).alias("rn")
    )


@register(
    "q_permutation_entropy",
    f"""
    WITH {_SQL_DAILY},
    trip AS (
      SELECT a.c AS v1, b.c AS v2, cc.c AS v3
      FROM idx a JOIN idx b ON b.rn = a.rn + 1
      JOIN idx cc ON cc.rn = a.rn + 2
    ),
    pat AS (
      SELECT (CASE WHEN v2 < v1 OR (v2 = v1 AND FALSE) THEN 1 ELSE 0 END)
             + (CASE WHEN v3 < v1 THEN 1 ELSE 0 END) * 2
             + (CASE WHEN v3 < v2 THEN 1 ELSE 0 END) * 4 AS code,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM trip GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS t FROM pat)
    SELECT CAST(tot.t AS BIGINT) AS n_windows,
           CAST((SELECT COUNT(*) FROM pat) AS BIGINT) AS n_patterns,
           round(SUM(-(pat.n * 1.0 / tot.t) * ln(pat.n * 1.0 / tot.t)), 6)
             AS perm_entropy_nats,
           round(SUM(-(pat.n * 1.0 / tot.t) * ln(pat.n * 1.0 / tot.t))
                 / ln(6.0), 6) AS perm_entropy_norm
    FROM pat CROSS JOIN tot
    GROUP BY tot.t
    """,
)
def q_permutation_entropy(spark, sf_dir):
    """R632 — Bandt-Pompe permutation entropy (m={m}) of the daily
    series: each consecutive triple maps to its ordinal pattern (coded
    by the three pairwise "strictly less" bits — ties collapse
    deterministically toward the earlier index, stated), then
    H = −Σ p ln p over pattern frequencies, normalized by ln(3!).  One
    self-join chain over ≤31 indexed rows.""".format(m=_PE_M)
    idx = _spark_daily(spark, sf_dir)
    a, b, c = idx.alias("a"), idx.alias("b"), idx.alias("c")
    trip = (
        a.join(b, F.col("b.rn") == F.col("a.rn") + 1)
        .join(c, F.col("c.rn") == F.col("a.rn") + 2)
        .select(
            F.col("a.c").alias("v1"),
            F.col("b.c").alias("v2"),
            F.col("c.c").alias("v3"),
        )
    )
    code = (
        F.when(F.col("v2") < F.col("v1"), 1).otherwise(0)
        + F.when(F.col("v3") < F.col("v1"), 1).otherwise(0) * 2
        + F.when(F.col("v3") < F.col("v2"), 1).otherwise(0) * 4
    )
    pat = trip.groupBy(code.alias("code")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = pat.agg(F.sum("n").alias("t"))
    p = F.col("n") * 1.0 / F.col("t")
    return (
        pat.crossJoin(F.broadcast(tot))
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n_patterns"),
            F.sum(-p * F.log(p)).alias("h"),
        )
        .select(
            F.col("t").cast("long").alias("n_windows"),
            F.col("n_patterns").cast("long").alias("n_patterns"),
            F.round("h", 6).alias("perm_entropy_nats"),
            F.round(F.col("h") / F.log(F.lit(6.0)), 6).alias(
                "perm_entropy_norm"
            ),
        )
    )


@register(
    "q_sample_entropy",
    f"""
    WITH {_SQL_DAILY},
    st AS (
      SELECT COUNT(*) AS n, AVG(c * 1.0) AS mu,
             sqrt((SUM(c * c) - SUM(c) * 1.0 * SUM(c) / COUNT(*))
                  / (COUNT(*) - 1)) AS sd
      FROM idx
    ),
    pairs AS (
      SELECT a.rn AS i, b.rn AS j,
             GREATEST(ABS(a.c - b.c) * 1.0,
                      ABS(a2.c - b2.c) * 1.0) AS d2,
             GREATEST(ABS(a.c - b.c) * 1.0, ABS(a2.c - b2.c) * 1.0,
                      ABS(a3.c - b3.c) * 1.0) AS d3,
             (a3.rn IS NOT NULL AND b3.rn IS NOT NULL) AS has3
      FROM idx a
      JOIN idx a2 ON a2.rn = a.rn + 1
      LEFT JOIN idx a3 ON a3.rn = a.rn + 2
      JOIN idx b ON b.rn > a.rn
      JOIN idx b2 ON b2.rn = b.rn + 1
      LEFT JOIN idx b3 ON b3.rn = b.rn + 2
    ),
    counts AS (
      SELECT SUM(CASE WHEN d2 <= {_SE_R_FRAC} * st.sd THEN 1 ELSE 0 END)
               AS bb,
             SUM(CASE WHEN has3 AND d3 <= {_SE_R_FRAC} * st.sd
                 THEN 1 ELSE 0 END) AS aa
      FROM pairs CROSS JOIN st
    )
    SELECT CAST(bb AS BIGINT) AS m_matches,
           CAST(aa AS BIGINT) AS m1_matches,
           round(CASE WHEN aa > 0 AND bb > 0
                 THEN -ln(aa * 1.0 / bb) END, 6) AS sampen
    FROM counts
    """,
)
def q_sample_entropy(spark, sf_dir):
    """R633 — SampEn(m={m}, r={r}·σ) of the daily series: B = pairs of
    distinct {m}-windows with Chebyshev distance ≤ r, A = same for
    {m1}-windows (computed over the SAME i<j pair frame so A ⊆ B
    windows align; windows lacking a third point drop from A only) —
    SampEn = −ln(A/B), NULL when undefined.  The pair frame is ≤31²
    rows, calendar-bounded.""".format(
        m=_SE_M, m1=_SE_M + 1, r=_SE_R_FRAC
    )
    idx = _spark_daily(spark, sf_dir)
    st = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sqrt(
            (
                F.sum(F.col("c") * F.col("c"))
                - F.sum("c") * 1.0 * F.sum("c") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("sd"),
    )
    a = idx.alias("a")
    a2 = idx.alias("a2")
    a3 = idx.alias("a3")
    b = idx.alias("b")
    b2 = idx.alias("b2")
    b3 = idx.alias("b3")
    pairs = (
        a.join(a2, F.col("a2.rn") == F.col("a.rn") + 1)
        .join(a3, F.col("a3.rn") == F.col("a.rn") + 2, "left")
        .join(b, F.col("b.rn") > F.col("a.rn"))
        .join(b2, F.col("b2.rn") == F.col("b.rn") + 1)
        .join(b3, F.col("b3.rn") == F.col("b.rn") + 2, "left")
        .select(
            F.greatest(
                F.abs(F.col("a.c") - F.col("b.c")) * 1.0,
                F.abs(F.col("a2.c") - F.col("b2.c")) * 1.0,
            ).alias("d2"),
            F.greatest(
                F.abs(F.col("a.c") - F.col("b.c")) * 1.0,
                F.abs(F.col("a2.c") - F.col("b2.c")) * 1.0,
                F.abs(F.col("a3.c") - F.col("b3.c")) * 1.0,
            ).alias("d3"),
            (
                F.col("a3.rn").isNotNull() & F.col("b3.rn").isNotNull()
            ).alias("has3"),
        )
    )
    counts = pairs.crossJoin(F.broadcast(st)).agg(
        F.sum(
            F.when(F.col("d2") <= _SE_R_FRAC * F.col("sd"), 1).otherwise(0)
        ).alias("bb"),
        F.sum(
            F.when(
                F.col("has3")
                & (F.col("d3") <= _SE_R_FRAC * F.col("sd")),
                1,
            ).otherwise(0)
        ).alias("aa"),
    )
    return counts.select(
        F.col("bb").cast("long").alias("m_matches"),
        F.col("aa").cast("long").alias("m1_matches"),
        F.round(
            F.when(
                (F.col("aa") > 0) & (F.col("bb") > 0),
                -F.log(F.col("aa") * 1.0 / F.col("bb")),
            ),
            6,
        ).alias("sampen"),
    )


@register(
    "q_kpss_level",
    f"""
    WITH {_SQL_DAILY},
    st AS (
      SELECT COUNT(*) AS n, AVG(c * 1.0) AS mu FROM idx
    ),
    e AS (
      SELECT idx.rn, idx.c - st.mu AS e FROM idx CROSS JOIN st
    ),
    s AS (
      SELECT a.rn, SUM(b.e) AS s_t
      FROM e a JOIN e b ON b.rn <= a.rn
      GROUP BY a.rn
    ),
    gam AS (
      SELECT j, SUM(a.e * b.e) / MAX(st.n) AS g
      FROM (SELECT UNNEST(range(0, {_KPSS_L} + 1)) AS j) lags
      JOIN e a ON TRUE
      JOIN e b ON b.rn = a.rn + j
      CROSS JOIN st
      GROUP BY j
    ),
    lrv AS (
      SELECT SUM(CASE WHEN j = 0 THEN g
                 ELSE 2.0 * (1.0 - j * 1.0 / ({_KPSS_L} + 1)) * g END)
               AS s2
      FROM gam
    ),
    num AS (SELECT SUM(s_t * s_t) AS ss FROM s)
    SELECT CAST(st.n AS BIGINT) AS n_days,
           round(lrv.s2, 6) AS longrun_var,
           round(num.ss / (st.n * 1.0 * st.n * lrv.s2), 6) AS kpss_stat,
           (num.ss / (st.n * 1.0 * st.n * lrv.s2) > {_KPSS_CRIT_5})
             AS reject_level_stationarity_5pct
    FROM st CROSS JOIN lrv CROSS JOIN num
    """,
)
def q_kpss_level(spark, sf_dir):
    """R634 — KPSS level-stationarity test of the daily series:
    η = n⁻² Σ S_t² / σ̂²_LR with S_t the partial sums of the demeaned
    series and σ̂²_LR the Bartlett-kernel long-run variance at
    bandwidth l={l} (γ₀ + 2Σ(1−j/(l+1))γⱼ); reject level stationarity
    at 5% when η > {crit} (the published asymptotic critical value).
    The null here is STATIONARITY — the complement of unit-root tests;
    read with q_variance_ratio/q_hurst_rs.  Everything is offset joins
    over the ≤31-row frame.""".format(l=_KPSS_L, crit=_KPSS_CRIT_5)
    idx = _spark_daily(spark, sf_dir)
    st = idx.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.col("c") * 1.0).alias("mu")
    )
    e = idx.crossJoin(F.broadcast(st)).select(
        "rn", (F.col("c") - F.col("mu")).alias("e"), "n"
    )
    a, b = e.alias("a"), e.alias("b")
    s = (
        a.join(b, F.col("b.rn") <= F.col("a.rn"))
        .groupBy(F.col("a.rn"))
        .agg(F.sum(F.col("b.e")).alias("s_t"))
    )
    lags = idx.sparkSession.range(0, _KPSS_L + 1).select(
        F.col("id").alias("j")
    )
    gam = (
        lags.join(a, F.lit(True))
        .join(b, F.col("b.rn") == F.col("a.rn") + F.col("j"))
        .groupBy("j")
        .agg((F.sum(F.col("a.e") * F.col("b.e")) / F.max(F.col("a.n"))).alias("g"))
    )
    lrv = gam.agg(
        F.sum(
            F.when(F.col("j") == 0, F.col("g")).otherwise(
                2.0 * (1.0 - F.col("j") * 1.0 / (_KPSS_L + 1)) * F.col("g")
            )
        ).alias("s2")
    )
    num = s.agg(F.sum(F.col("s_t") * F.col("s_t")).alias("ss"))
    stat = F.col("ss") / (F.col("n") * 1.0 * F.col("n") * F.col("s2"))
    return (
        st.crossJoin(F.broadcast(lrv))
        .crossJoin(F.broadcast(num))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.round("s2", 6).alias("longrun_var"),
            F.round(stat, 6).alias("kpss_stat"),
            (stat > _KPSS_CRIT_5).alias(
                "reject_level_stationarity_5pct"
            ),
        )
    )
