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
from pyspark.sql import Window

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
             user_id % 2 = 0 AS in_x, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    ranked AS (
      SELECT in_x,
             ROW_NUMBER() OVER (ORDER BY v, event_id) AS r,
             ROW_NUMBER() OVER (PARTITION BY in_x ORDER BY v, event_id)
               AS i
      FROM vals
    ),
    sums AS (
      SELECT
        CAST(SUM(CASE WHEN in_x THEN 1 ELSE 0 END) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN in_x THEN 0 ELSE 1 END) AS BIGINT) AS m,
        SUM(CASE WHEN in_x THEN (r - i) * 1.0 * (r - i) ELSE 0 END)
          AS sx,
        SUM(CASE WHEN in_x THEN 0 ELSE (r - i) * 1.0 * (r - i) END)
          AS sy
      FROM ranked
    )
    SELECT n AS n_x, m AS n_y,
           round((n * sx + m * sy) / (n * 1.0 * m * (n + m))
                 - (4.0 * n * m - 1) / (6.0 * (n + m)), 6)
             AS cvm_t,
           (n * sx + m * sy) / (n * 1.0 * m * (n + m))
             - (4.0 * n * m - 1) / (6.0 * (n + m)) > 0.461
             AS reject_5pct
    FROM sums
    """,
)
def q_cvm_test(spark, sf_dir):
    """R450 — two-sample Cramér-von Mises (rank form, Anderson 1962):
    with combined ranks r_i of sample X and s_j of sample Y (exact
    integer cents; ties broken by event_id identically in both
    engines), U = nΣ(r_i−i)² + mΣ(s_j−j)², T = U/(nm(n+m)) −
    (4nm−1)/(6(n+m)), vs the asymptotic 5% critical 0.461. Cohorts =
    even/odd user_id — the same-distribution null should HOLD here
    (both cohorts draw from one generator), asserted in tests along
    with the scipy cross-check. Two window ranks over one
    sort-shuffle."""
    ev = read_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    vals = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.col("user_id") % 2 == 0).alias("in_x"),
        "event_id",
    )
    ranked = vals.select(
        "in_x",
        F.row_number().over(Window.orderBy("v", "event_id")).alias("r"),
        F.row_number()
        .over(Window.partitionBy("in_x").orderBy("v", "event_id"))
        .alias("i"),
    )
    dev2 = (F.col("r") - F.col("i")) * 1.0 * (F.col("r") - F.col("i"))
    sums = ranked.agg(
        F.sum(F.when(F.col("in_x"), 1).otherwise(0)).cast("long").alias("n"),
        F.sum(F.when(F.col("in_x"), 0).otherwise(1)).cast("long").alias("m"),
        F.sum(F.when(F.col("in_x"), dev2).otherwise(0.0)).alias("sx"),
        F.sum(F.when(F.col("in_x"), 0.0).otherwise(dev2)).alias("sy"),
    )
    t = (
        (F.col("n") * F.col("sx") + F.col("m") * F.col("sy"))
        / (F.col("n") * 1.0 * F.col("m") * (F.col("n") + F.col("m")))
        - (4.0 * F.col("n") * F.col("m") - 1)
        / (6.0 * (F.col("n") + F.col("m")))
    )
    return sums.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        F.round(t, 6).alias("cvm_t"),
        (t > 0.461).alias("reject_5pct"),
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
