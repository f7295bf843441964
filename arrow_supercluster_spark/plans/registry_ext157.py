"""Round-6 registry additions, batch 152 — effect size, distribution
equality, and single-outlier testing:

- q_cramers_v: Cramér's V (plain and Bergsma bias-corrected) for the
  (source × lang) contingency table — the EFFECT SIZE companion to
  q_chi2_independence: χ² says "dependent", V says "how much",
  and the bias correction keeps small tables from overstating it.
- q_cvm_test: two-sample Cramér-von Mises over purchase values of the
  even/odd user cohorts — the rank-based distribution-equality test
  that weights the WHOLE CDF gap (q_ks_test sees only the max gap;
  CvM integrates it, catching spread/tail differences KS misses).
- q_grubbs_test: Grubbs' maximum-studentized-deviate test on the
  daily event counts — G = max|x−x̄|/s against the n=30 5% critical
  value, naming the flagged day. The single-outlier hypothesis test
  behind q_zscore_outliers' rule-of-thumb flags.

At 100 TB: V is |sources|×|langs| cells; CvM ranks one
cohort-collapsed column (a single sort-shuffle); Grubbs is a ≤31-row
fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.sources.tables import read_events

_GRUBBS_CRIT = 2.9085  # two-sided 5% critical value for n = 30


# ===========================================================================
# R449 — Cramér's V (plain + bias-corrected)
# ===========================================================================

@register(
    "q_cramers_v",
    """
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY source, lang
    ),
    rows_ AS (
      SELECT source, CAST(SUM(o) AS BIGINT) AS ro FROM cells GROUP BY source
    ),
    cols_ AS (
      SELECT lang, CAST(SUM(o) AS BIGINT) AS co FROM cells GROUP BY lang
    ),
    tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST((SELECT COUNT(*) FROM rows_) AS BIGINT) AS r,
             CAST((SELECT COUNT(*) FROM cols_) AS BIGINT) AS c
      FROM cells
    ),
    grid AS (
      -- every (row, col) combination: zero cells still carry E > 0
      SELECT rows_.source, cols_.lang, rows_.ro, cols_.co,
             COALESCE(cells.o, 0) AS o
      FROM rows_ CROSS JOIN cols_
      LEFT JOIN cells ON cells.source = rows_.source
                     AND cells.lang = cols_.lang
    ),
    chi AS (
      SELECT SUM(
        (grid.o - grid.ro * 1.0 * grid.co / tot.n)
        * (grid.o - grid.ro * 1.0 * grid.co / tot.n)
        / (grid.ro * 1.0 * grid.co / tot.n)
      ) AS chi2
      FROM grid CROSS JOIN tot
    ),
    vv AS (
      SELECT tot.n, tot.r, tot.c, chi.chi2,
             chi.chi2 / tot.n AS phi2,
             greatest(0.0, chi.chi2 / tot.n
                      - (tot.r - 1.0) * (tot.c - 1.0) / (tot.n - 1))
               AS phi2c,
             tot.r - (tot.r - 1.0) * (tot.r - 1.0) / (tot.n - 1) AS rc,
             tot.c - (tot.c - 1.0) * (tot.c - 1.0) / (tot.n - 1) AS cc
      FROM tot CROSS JOIN chi
    )
    SELECT n, r AS n_rows, c AS n_cols,
           round(chi2, 4) AS chi2,
           round(sqrt(phi2 / least(r - 1.0, c - 1.0)), 6) AS cramers_v,
           round(sqrt(phi2c / least(rc - 1.0, cc - 1.0)), 6)
             AS cramers_v_corrected
    FROM vv
    """,
)
def q_cramers_v(spark, sf_dir):
    """R449 — Cramér's V over (source × lang): plain V =
    √(φ²/min(r−1,c−1)) with φ² = χ²/n, plus the Bergsma bias-corrected
    form (φ² and the dimensions each shrunk by their small-sample
    expectation, floored at 0). Cells are exact counts; the χ² fold is
    |r×c| rows. scipy.stats.contingency.association cross-checks the
    plain V in tests; the corrected one is re-derived in python."""
    docs = _docs(spark, sf_dir)
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("o")
    )
    rows_ = cells.groupBy("source").agg(F.sum("o").alias("ro"))
    cols_ = cells.groupBy("lang").agg(F.sum("o").alias("co"))
    tot = cells.agg(F.sum("o").alias("n")).crossJoin(
        F.broadcast(rows_.agg(F.count(F.lit(1)).alias("r")))
    ).crossJoin(F.broadcast(cols_.agg(F.count(F.lit(1)).alias("c"))))
    e = F.col("ro") * 1.0 * F.col("co") / F.col("n")
    # every (row, col) combination: zero cells still carry E > 0
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .join(cells, ["source", "lang"], "left")
        .select("ro", "co", F.coalesce(F.col("o"), F.lit(0)).alias("o"))
    )
    chi = (
        grid.crossJoin(F.broadcast(tot))
        .agg(
            F.sum((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2")
        )
    )
    vv = tot.crossJoin(F.broadcast(chi)).select(
        "n", "r", "c", "chi2",
        (F.col("chi2") / F.col("n")).alias("phi2"),
        F.greatest(
            F.lit(0.0),
            F.col("chi2") / F.col("n")
            - (F.col("r") - 1.0) * (F.col("c") - 1.0) / (F.col("n") - 1),
        ).alias("phi2c"),
        (
            F.col("r")
            - (F.col("r") - 1.0) * (F.col("r") - 1.0) / (F.col("n") - 1)
        ).alias("rc"),
        (
            F.col("c")
            - (F.col("c") - 1.0) * (F.col("c") - 1.0) / (F.col("n") - 1)
        ).alias("cc"),
    )
    return vv.select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("n_rows"),
        F.col("c").cast("long").alias("n_cols"),
        F.round("chi2", 4).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("phi2") / F.least(F.col("r") - 1.0, F.col("c") - 1.0)
            ),
            6,
        ).alias("cramers_v"),
        F.round(
            F.sqrt(
                F.col("phi2c")
                / F.least(F.col("rc") - 1.0, F.col("cc") - 1.0)
            ),
            6,
        ).alias("cramers_v_corrected"),
    )


# ===========================================================================
# R450 — two-sample Cramér-von Mises
# ===========================================================================

@register(
    "q_cvm_test",
    """
    WITH vals AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v,
             user_id % 2 = 0 AS in_x
      FROM events WHERE event_type = 'purchase'
    ),
    per_v AS (
      SELECT v,
             CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT) AS g0,
             CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT) AS g1,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM vals GROUP BY v
    ),
    cum AS (
      SELECT w,
             SUM(g0) OVER (ORDER BY v) AS c0,
             SUM(g1) OVER (ORDER BY v) AS c1
      FROM per_v
    ),
    nn AS (
      SELECT CAST(SUM(g0) AS BIGINT) AS n,
             CAST(SUM(g1) AS BIGINT) AS m
      FROM per_v
    ),
    t AS (
      SELECT nn.n, nn.m,
             nn.n * 1.0 * nn.m / ((nn.n + nn.m) * 1.0 * (nn.n + nn.m))
               * SUM(cum.w * (cum.c0 * 1.0 / nn.n - cum.c1 * 1.0 / nn.m)
                           * (cum.c0 * 1.0 / nn.n - cum.c1 * 1.0 / nn.m))
               AS t
      FROM cum CROSS JOIN nn GROUP BY nn.n, nn.m
    )
    SELECT n AS n_x, m AS n_y,
           round(t, 6) AS cvm_t,
           t > 0.461 AS reject_5pct
    FROM t
    """,
)
def q_cvm_test(spark, sf_dir):
    """R450 — two-sample Cramér-von Mises in the tie-aware ECDF form:
    T = nm/(n+m)²·Σ_z w_z (F_n(z) − G_m(z))² summed over every
    observation z (equal to Anderson's rank form when ties are
    absent), vs the asymptotic 5% critical 0.461. The value frame
    collapses to distinct integer cents FIRST; the cumulative counts
    come from the distributed zip_scan, not a global window (the
    round-4 q_ks_test de-weak, reused — the oracle twin keeps the
    plain windowed form over the same collapsed frame). Cohorts =
    even/odd user_id — the same-distribution null should HOLD
    (asserted), and scipy cross-checks the statistic."""
    from arrow_supercluster_spark.functions.distrank import zip_scan

    ev = read_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    vals = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.col("user_id") % 2 == 0).alias("in_x"),
    )
    per_v = vals.groupBy("v").agg(
        F.sum(F.when(F.col("in_x"), 1).otherwise(0)).alias("g0"),
        F.sum(F.when(F.col("in_x"), 0).otherwise(1)).alias("g1"),
        F.count(F.lit(1)).alias("w"),
    )
    cum, _, totals = zip_scan(
        per_v, ["v"], out="_i", scan_col=["g0", "g1"], scan_out=["c0", "c1"]
    )
    nn = per_v.agg(
        F.sum("g0").cast("long").alias("n"),
        F.sum("g1").cast("long").alias("m"),
    )
    gap = F.col("c0") * 1.0 / F.col("n") - F.col("c1") * 1.0 / F.col("m")
    t = (
        cum.crossJoin(F.broadcast(nn))
        .groupBy("n", "m")
        .agg(F.sum(F.col("w") * gap * gap).alias("s"))
        .select(
            "n",
            "m",
            (
                F.col("n") * 1.0 * F.col("m")
                / ((F.col("n") + F.col("m")) * 1.0
                   * (F.col("n") + F.col("m")))
                * F.col("s")
            ).alias("t"),
        )
    )
    return t.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        F.round("t", 6).alias("cvm_t"),
        (F.col("t") > 0.461).alias("reject_5pct"),
    )


# ===========================================================================
# R451 — Grubbs' outlier test
# ===========================================================================

@register(
    "q_grubbs_test",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(c * 1.0) AS mu,
             sqrt(SUM((c - (SELECT AVG(c * 1.0) FROM daily))
                      * (c - (SELECT AVG(c * 1.0) FROM daily)))
                  / (COUNT(*) - 1)) AS s
      FROM daily
    ),
    dev AS (
      SELECT daily.d, daily.c,
             abs(daily.c - stats.mu) / stats.s AS g
      FROM daily CROSS JOIN stats
    ),
    top AS (
      SELECT d, c, g FROM dev ORDER BY g DESC, d LIMIT 1
    )
    SELECT stats.n AS n_days, top.d AS flagged_day,
           CAST(top.c AS BIGINT) AS flagged_count,
           round(stats.mu, 4) AS mean_count,
           round(stats.s, 4) AS sd_count,
           round(top.g, 4) AS grubbs_g,
           top.g > {_GRUBBS_CRIT} AS outlier_detected
    FROM stats CROSS JOIN top
    """,
)
def q_grubbs_test(spark, sf_dir):
    """R451 — Grubbs on the daily counts: G = max|x−x̄|/s (sample sd,
    n−1), flagged day reported, verdict vs the n=30 two-sided 5%
    table critical {crit} (a stated constant, like q_chow_test's F
    critical, so both engines agree exactly). The hypothesis-test
    form of q_zscore_outliers / q_mad_outliers; one ≤31-row fold plus
    a deterministic (g DESC, d) top-1.""".format(crit=_GRUBBS_CRIT)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mu_frame = daily.agg(F.avg(F.col("c") * 1.0).alias("mu"))
    stats = daily.crossJoin(F.broadcast(mu_frame)).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("mu").alias("mu"),
        F.sqrt(
            F.sum(
                (F.col("c") - F.col("mu")) * (F.col("c") - F.col("mu"))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("s"),
    )
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "d",
        "c",
        "n",
        "mu",
        "s",
        (F.abs(F.col("c") - F.col("mu")) / F.col("s")).alias("g"),
    )
    top = dev.orderBy(F.desc("g"), F.asc("d")).limit(1)
    return top.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("d").alias("flagged_day"),
        F.col("c").cast("long").alias("flagged_count"),
        F.round("mu", 4).alias("mean_count"),
        F.round("s", 4).alias("sd_count"),
        F.round("g", 4).alias("grubbs_g"),
        (F.col("g") > _GRUBBS_CRIT).alias("outlier_detected"),
    )
