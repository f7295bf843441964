"""Round-6 registry additions, batch 163 — the paired and k-sample
nonparametric location tests still missing from the battery:

- q_wilcoxon_signed_rank: paired Wilcoxon on the per-day (click,
  view) count difference — signed midranks of |d|, W+ vs its null
  mean n(n+1)/4 with the normal approximation (tie-corrected
  variance). The PAIRED complement of q_mann_whitney (independent
  samples); pairing on the day removes the shared daily-traffic
  factor the unpaired test wastes power on.
- q_sign_test: the sign test on the same pairs — binomial(n, ½) on
  the positive-difference count via the continuity-corrected normal
  approximation. Assumption-free (no symmetry), the lower-power
  sanity bound under Wilcoxon.
- q_moods_median: Mood's median test across the five event types'
  value distributions — 2×k χ² on above/below-grand-median counts.
  The k-sample location test with the weakest assumptions
  (q_kruskal_wallis needs comparable shapes; this only needs the
  median split).

At 100 TB: the paired tests collapse to ≤31 day rows; Mood's is one
grand-median pass plus a 2×k cell aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_MM_CRIT = 9.488  # chi2(4) at 5%

_SQL_PAIRS = """
    pairs AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT)
             - CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS diff
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY 1
    ),
    nz AS (SELECT d, diff, abs(diff) AS ad FROM pairs WHERE diff != 0)
"""


# ===========================================================================
# R482 — Wilcoxon signed-rank test (paired)
# ===========================================================================

@register(
    "q_wilcoxon_signed_rank",
    f"""
    WITH {_SQL_PAIRS},
    ranked AS (
      SELECT a.d, a.diff,
             (SELECT COUNT(*) FROM nz b WHERE b.ad < a.ad)
             + (1 + (SELECT COUNT(*) FROM nz b WHERE b.ad = a.ad)) / 2.0
               AS midrank
      FROM nz a
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CASE WHEN diff > 0 THEN midrank ELSE 0 END) AS w_plus
      FROM ranked
    ),
    ties AS (
      SELECT COALESCE(SUM(tc * tc * tc - tc), 0) AS tie_term
      FROM (SELECT COUNT(*) AS tc FROM nz GROUP BY ad HAVING COUNT(*) > 1)
    )
    SELECT s.n AS n_nonzero_pairs,
           round(s.w_plus, 2) AS w_plus,
           round(s.n * (s.n + 1) / 4.0, 2) AS w_null_mean,
           round((s.w_plus - s.n * (s.n + 1) / 4.0)
                 / sqrt(s.n * (s.n + 1.0) * (2 * s.n + 1) / 24.0
                        - ties.tie_term / 48.0), 4) AS z,
           abs((s.w_plus - s.n * (s.n + 1) / 4.0)
               / sqrt(s.n * (s.n + 1.0) * (2 * s.n + 1) / 24.0
                      - ties.tie_term / 48.0)) > 1.96
             AS reject_5pct
    FROM s CROSS JOIN ties
    """,
)
def q_wilcoxon_signed_rank(spark, sf_dir):
    """R482 — paired Wilcoxon on the per-day click−view difference:
    zero differences drop (the standard convention), |d| midranks via
    the bounded count-based rank (strictly-smaller count + half the
    tie block — exact rational arithmetic, no window), W+ against the
    null mean n(n+1)/4 with the tie-corrected variance
    n(n+1)(2n+1)/24 − Σ(t³−t)/48, z vs ±1.96. scipy.stats.wilcoxon
    (correction=False) is the test oracle. ≤31-row frame; the rank
    'join' is |days|² cells at most."""
    ev = read_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "view")
    )
    pairs = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        (
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            - F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        ).alias("diff")
    )
    nz = pairs.filter(F.col("diff") != 0).select(
        "d", "diff", F.abs("diff").alias("ad")
    )
    b = nz.select(F.col("ad").alias("bd"))
    ranked = (
        nz.join(b, F.lit(True))
        .groupBy("d", "diff", "ad")
        .agg(
            F.sum(F.when(F.col("bd") < F.col("ad"), 1).otherwise(0))
            .alias("lt"),
            F.sum(F.when(F.col("bd") == F.col("ad"), 1).otherwise(0))
            .alias("eq"),
        )
        .select(
            "diff",
            (F.col("lt") + (1 + F.col("eq")) / 2.0).alias("midrank"),
            "ad",
        )
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("diff") > 0, F.col("midrank")).otherwise(0.0)
        ).alias("w_plus"),
    )
    ties = (
        nz.groupBy("ad")
        .agg(F.count(F.lit(1)).alias("tc"))
        .filter(F.col("tc") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc")
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(ties))
    var = (
        F.col("n") * (F.col("n") + 1.0) * (2 * F.col("n") + 1) / 24.0
        - F.col("tie_term") / 48.0
    )
    z = (F.col("w_plus") - F.col("n") * (F.col("n") + 1) / 4.0) / F.sqrt(var)
    return j.select(
        F.col("n").cast("long").alias("n_nonzero_pairs"),
        F.round("w_plus", 2).alias("w_plus"),
        F.round(F.col("n") * (F.col("n") + 1) / 4.0, 2).alias(
            "w_null_mean"
        ),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("reject_5pct"),
    )


# ===========================================================================
# R483 — sign test (paired)
# ===========================================================================

@register(
    "q_sign_test",
    f"""
    WITH {_SQL_PAIRS},
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos
      FROM nz
    )
    SELECT n AS n_nonzero_pairs, n_pos,
           round((abs(n_pos - n / 2.0) - 0.5) / sqrt(n / 4.0), 4) AS z,
           (abs(n_pos - n / 2.0) - 0.5) / sqrt(n / 4.0) > 1.96
             AS reject_5pct
    FROM s
    """,
)
def q_sign_test(spark, sf_dir):
    """R483 — sign test on the same click−view day pairs: positives vs
    binomial(n, ½) via the continuity-corrected normal z =
    (|k − n/2| − ½)/√(n/4), two-sided at 1.96. No symmetry assumption
    — the floor under q_wilcoxon_signed_rank; when they disagree the
    difference distribution is skewed. One ≤31-row aggregation."""
    ev = read_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "view")
    )
    pairs = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        (
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            - F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        ).alias("diff")
    )
    nz = pairs.filter(F.col("diff") != 0)
    s = nz.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0))
        .cast("long").alias("n_pos"),
    )
    z = (
        F.abs(F.col("n_pos") - F.col("n") / 2.0) - 0.5
    ) / F.sqrt(F.col("n") / 4.0)
    return s.select(
        F.col("n").cast("long").alias("n_nonzero_pairs"),
        "n_pos",
        F.round(z, 4).alias("z"),
        (z > 1.96).alias("reject_5pct"),
    )


# ===========================================================================
# R484 — Mood's median test (k samples)
# ===========================================================================

@register(
    "q_moods_median",
    f"""
    WITH vals AS (
      SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    med AS (SELECT quantile_cont(c, 0.5) AS m FROM vals),
    cells AS (
      SELECT g,
             CAST(SUM(CASE WHEN vals.c > med.m THEN 1 ELSE 0 END)
                  AS BIGINT) AS above,
             CAST(SUM(CASE WHEN vals.c <= med.m THEN 1 ELSE 0 END)
                  AS BIGINT) AS below
      FROM vals CROSS JOIN med GROUP BY g
    ),
    tot AS (
      SELECT CAST(SUM(above) AS BIGINT) AS ta,
             CAST(SUM(below) AS BIGINT) AS tb,
             CAST(SUM(above + below) AS BIGINT) AS n
      FROM cells
    ),
    chi AS (
      SELECT SUM(
        (cells.above - (cells.above + cells.below) * 1.0 * tot.ta / tot.n)
        * (cells.above - (cells.above + cells.below) * 1.0 * tot.ta
           / tot.n)
        / ((cells.above + cells.below) * 1.0 * tot.ta / tot.n)
        + (cells.below - (cells.above + cells.below) * 1.0 * tot.tb
           / tot.n)
        * (cells.below - (cells.above + cells.below) * 1.0 * tot.tb
           / tot.n)
        / ((cells.above + cells.below) * 1.0 * tot.tb / tot.n)
      ) AS chi2
      FROM cells CROSS JOIN tot
    )
    SELECT (SELECT n FROM tot) AS n,
           CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS k,
           round((SELECT m FROM med) / 100.0, 4) AS grand_median,
           round(chi.chi2, 4) AS moods_chi2,
           chi.chi2 > {_MM_CRIT} AS medians_differ
    FROM chi
    """,
)
def q_moods_median(spark, sf_dir):
    """R484 — Mood's median test over event-type values (exact integer
    cents): split every observation at the grand median
    (quantile_cont/percentile agree exactly on integers), 2×k χ² of
    above/≤ counts vs their margins, verdict at χ²(4) = {c}. The
    minimal-assumption k-sample location test under q_kruskal_wallis;
    scipy.stats.median_test(ties='below') is the oracle.""".format(
        c=_MM_CRIT
    )
    ev = read_events(spark, sf_dir)
    vals = ev.select(
        F.col("event_type").alias("g"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    med = vals.agg(F.expr("percentile(c, 0.5)").alias("m"))
    cells = vals.crossJoin(F.broadcast(med)).groupBy("g").agg(
        F.sum(F.when(F.col("c") > F.col("m"), 1).otherwise(0))
        .cast("long").alias("above"),
        F.sum(F.when(F.col("c") <= F.col("m"), 1).otherwise(0))
        .cast("long").alias("below"),
        F.max("m").alias("m"),
    )
    tot = cells.agg(
        F.sum("above").alias("ta"),
        F.sum("below").alias("tb"),
        F.sum(F.col("above") + F.col("below")).alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.max("m").alias("m"),
    )
    j = cells.drop("m").crossJoin(F.broadcast(tot))
    row_n = F.col("above") + F.col("below")
    ea = row_n * 1.0 * F.col("ta") / F.col("n")
    eb = row_n * 1.0 * F.col("tb") / F.col("n")
    chi = j.agg(
        F.sum(
            (F.col("above") - ea) * (F.col("above") - ea) / ea
            + (F.col("below") - eb) * (F.col("below") - eb) / eb
        ).alias("chi2"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.max("m").alias("m"),
    )
    return chi.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.round(F.col("m") / 100.0, 4).alias("grand_median"),
        F.round("chi2", 4).alias("moods_chi2"),
        (F.col("chi2") > _MM_CRIT).alias("medians_differ"),
    )
