"""Round-6 registry additions, batch 147 — multi-rater agreement:

- q_fleiss_kappa: Fleiss' κ over three deterministic length "raters"
  (char-count, token-count, distinct-token-count terciles) rating every
  document into {1,2,3} — chance-corrected agreement for m>2 raters,
  the generalization q_cohens_kappa (m=2) can't express. The raters
  are correlated length proxies by construction, so κ lands strictly
  inside (0, 1) and the test pins it against a python oracle.
- q_kendall_w: Kendall's coefficient of concordance between three
  judges ranking the 30 days (by event count, by purchase revenue, by
  distinct users) — rank-sum dispersion S against the maximum
  m²(n³−n)/12. The "do the metrics agree on which days mattered"
  question as one number.
- q_cochran_q: Cochran's Q for k=3 correlated binary treatments on
  user blocks (heavy purchaser / error-prone / near-daily-active) —
  the k-sample McNemar. Rejecting means the three user predicates
  genuinely differ in prevalence ON THE SAME users.

At 100 TB: κ's per-item category counts partial-aggregate map-side
(3 ratings/doc, no join); W collapses to ≤31 day rows; Q collapses to
per-user booleans then three scalar sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

_FK_M = 3  # raters
_CQ_CRIT = 5.991  # chi2(2) at 5%


# ===========================================================================
# R434 — Fleiss' kappa
# ===========================================================================

_SQL_RATINGS = f"""
      SELECT doc_id,
             CASE WHEN n_chars < 250 THEN 1
                  WHEN n_chars < 400 THEN 2 ELSE 3 END AS ra,
             CASE WHEN len({SQL_TOKS}) < 45 THEN 1
                  WHEN len({SQL_TOKS}) < 75 THEN 2 ELSE 3 END AS rb,
             CASE WHEN len(list_distinct({SQL_TOKS})) < 20 THEN 1
                  WHEN len(list_distinct({SQL_TOKS})) < 28 THEN 2
                  ELSE 3 END AS rc
      FROM documents
"""


@register(
    "q_fleiss_kappa",
    f"""
    WITH ratings AS ({_SQL_RATINGS}),
    long_r AS (
      SELECT doc_id, ra AS cat FROM ratings
      UNION ALL SELECT doc_id, rb FROM ratings
      UNION ALL SELECT doc_id, rc FROM ratings
    ),
    cell AS (
      SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS nij
      FROM long_r GROUP BY doc_id, cat
    ),
    per_item AS (
      SELECT doc_id,
             (SUM(nij * nij) - {_FK_M}) * 1.0
               / ({_FK_M} * ({_FK_M} - 1)) AS p_i
      FROM cell GROUP BY doc_id
    ),
    pbar AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(p_i) AS p_bar
      FROM per_item
    ),
    pj AS (
      SELECT SUM(
               (cj * 1.0 / (n_tot * {_FK_M}))
               * (cj * 1.0 / (n_tot * {_FK_M}))
             ) AS p_e
      FROM (
        SELECT cat, CAST(SUM(nij) AS BIGINT) AS cj,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM per_item) AS n_tot
        FROM cell GROUP BY cat
      )
    )
    SELECT pbar.n AS n_items, {_FK_M} AS n_raters,
           round(pbar.p_bar, 6) AS p_bar,
           round(pj.p_e, 6) AS p_expected,
           round((pbar.p_bar - pj.p_e) / (1 - pj.p_e), 6) AS fleiss_kappa
    FROM pbar CROSS JOIN pj
    """,
)
def q_fleiss_kappa(spark, sf_dir):
    """R434 — Fleiss' κ with m=3 deterministic raters (char / token /
    distinct-token terciles, fixed thresholds stated identically in
    both engines): per-item agreement P_i = (Σ n_ij² − m)/(m(m−1)),
    chance agreement P_e = Σ p_j², κ = (P̄−P_e)/(1−P_e). All counts
    exact integers; one groupBy(doc, cat) that partial-aggregates."""
    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir)
    toks = tokenize(F.col("text"))
    ra = (
        F.when(F.col("n_chars") < 250, 1)
        .when(F.col("n_chars") < 400, 2).otherwise(3)
    )
    rb = (
        F.when(F.size(toks) < 45, 1)
        .when(F.size(toks) < 75, 2).otherwise(3)
    )
    rc = (
        F.when(F.size(F.array_distinct(toks)) < 20, 1)
        .when(F.size(F.array_distinct(toks)) < 28, 2).otherwise(3)
    )
    ratings = docs.select(
        "doc_id", F.explode(F.array(ra, rb, rc)).alias("cat")
    )
    cell = ratings.groupBy("doc_id", "cat").agg(
        F.count(F.lit(1)).alias("nij")
    )
    per_item = cell.groupBy("doc_id").agg(
        (
            (F.sum(F.col("nij") * F.col("nij")) - _FK_M) * 1.0
            / (_FK_M * (_FK_M - 1))
        ).alias("p_i")
    )
    pbar = per_item.agg(
        F.count(F.lit(1)).alias("n"), F.avg("p_i").alias("p_bar")
    )
    cj = cell.groupBy("cat").agg(F.sum("nij").alias("cj"))
    pj = cj.crossJoin(F.broadcast(pbar.select("n"))).agg(
        F.sum(
            (F.col("cj") * 1.0 / (F.col("n") * _FK_M))
            * (F.col("cj") * 1.0 / (F.col("n") * _FK_M))
        ).alias("p_e")
    )
    return pbar.crossJoin(F.broadcast(pj)).select(
        F.col("n").cast("long").alias("n_items"),
        F.lit(_FK_M).alias("n_raters"),
        F.round("p_bar", 6).alias("p_bar"),
        F.round("p_e", 6).alias("p_expected"),
        F.round(
            (F.col("p_bar") - F.col("p_e")) / (1 - F.col("p_e")), 6
        ).alias("fleiss_kappa"),
    )


# ===========================================================================
# R435 — Kendall's W (coefficient of concordance)
# ===========================================================================

@register(
    "q_kendall_w",
    """
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS revenue_c,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1
    ),
    ranked AS (
      SELECT d,
        ROW_NUMBER() OVER (ORDER BY n_events DESC, d) AS r1,
        ROW_NUMBER() OVER (ORDER BY revenue_c DESC, d) AS r2,
        ROW_NUMBER() OVER (ORDER BY n_users DESC, d) AS r3
      FROM daily
    ),
    rs AS (SELECT r1 + r2 + r3 AS rsum FROM ranked),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM( (rsum - 3.0 * ((SELECT COUNT(*) FROM rs) + 1) / 2)
                * (rsum - 3.0 * ((SELECT COUNT(*) FROM rs) + 1) / 2) )
               AS ss
      FROM rs
    )
    SELECT n AS n_items, 3 AS n_judges,
           round(ss, 4) AS rank_dispersion,
           round(12.0 * ss / (9.0 * (n * n * n - n)), 6) AS kendall_w
    FROM s
    """,
)
def q_kendall_w(spark, sf_dir):
    """R435 — Kendall's W across three judges ranking the days: event
    count, purchase revenue (exact cents), distinct users; ranks are
    ROW_NUMBER with the identical (metric DESC, day ASC) tie-break in
    both engines, so the rank matrix is exact. W = 12·S/(m²(n³−n))
    with S the dispersion of rank sums around m(n+1)/2. ≤31-row
    frame."""
    from pyspark.sql import Window

    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("revenue_c"),
        F.countDistinct("user_id").alias("n_users"),
    )
    ranked = daily.select(
        "d",
        F.row_number().over(
            Window.orderBy(F.desc("n_events"), F.asc("d"))
        ).alias("r1"),
        F.row_number().over(
            Window.orderBy(F.desc("revenue_c"), F.asc("d"))
        ).alias("r2"),
        F.row_number().over(
            Window.orderBy(F.desc("n_users"), F.asc("d"))
        ).alias("r3"),
    )
    n_w = F.count(F.lit(1)).over(Window.partitionBy())
    dev = (
        F.col("r1") + F.col("r2") + F.col("r3") - 3.0 * (n_w + 1) / 2
    )
    s = ranked.select(dev.alias("dev")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("dev") * F.col("dev")).alias("ss"),
    )
    return s.select(
        F.col("n").cast("long").alias("n_items"),
        F.lit(3).alias("n_judges"),
        F.round("ss", 4).alias("rank_dispersion"),
        F.round(
            12.0 * F.col("ss")
            / (9.0 * (F.col("n") * F.col("n") * F.col("n") - F.col("n"))),
            6,
        ).alias("kendall_w"),
    )


# ===========================================================================
# R436 — Cochran's Q test
# ===========================================================================

@register(
    "q_cochran_q",
    f"""
    WITH per_user AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
             AS INTEGER) AS t1,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) >= 13
             AS INTEGER) AS t2,
        CAST(COUNT(DISTINCT strftime(ts, '%d')) >= 28 AS INTEGER) AS t3
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t1) AS BIGINT) AS c1,
             CAST(SUM(t2) AS BIGINT) AS c2,
             CAST(SUM(t3) AS BIGINT) AS c3,
             CAST(SUM((t1 + t2 + t3) * (t1 + t2 + t3)) AS BIGINT) AS sr2
      FROM per_user
    )
    SELECT n AS n_users, c1 AS n_heavy_buyers, c2 AS n_error_prone,
           c3 AS n_near_daily,
           round(2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
                        - (c1 + c2 + c3) * (c1 + c2 + c3))
                 / (3.0 * (c1 + c2 + c3) - sr2), 4) AS cochran_q,
           2.0 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
                  - (c1 + c2 + c3) * (c1 + c2 + c3))
             / (3.0 * (c1 + c2 + c3) - sr2) > {_CQ_CRIT}
             AS prevalences_differ
    FROM s
    """,
)
def q_cochran_q(spark, sf_dir):
    """R436 — Cochran's Q over k=3 binary treatments on user blocks
    (≥14 purchases / ≥13 errors / active ≥28 distinct days): Q =
    (k−1)[kΣC_j² − N²]/(kN − ΣR_i²), the k-sample McNemar. Every term
    is an exact integer sum; blocks with all-equal outcomes cancel in
    the formula as the test requires. One per-user aggregation then
    four scalars."""
    ev = read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ) >= 14
        ).cast("int").alias("t1"),
        (
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ) >= 13
        ).cast("int").alias("t2"),
        (F.countDistinct(F.dayofmonth("ts")) >= 28).cast("int").alias("t3"),
    )
    rsum = F.col("t1") + F.col("t2") + F.col("t3")
    s = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t1").alias("c1"),
        F.sum("t2").alias("c2"),
        F.sum("t3").alias("c3"),
        F.sum(rsum * rsum).alias("sr2"),
    )
    csum = F.col("c1") + F.col("c2") + F.col("c3")
    csq = (
        F.col("c1") * F.col("c1")
        + F.col("c2") * F.col("c2")
        + F.col("c3") * F.col("c3")
    )
    q = 2.0 * (3 * csq - csum * csum) / (3.0 * csum - F.col("sr2"))
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("c1").cast("long").alias("n_heavy_buyers"),
        F.col("c2").cast("long").alias("n_error_prone"),
        F.col("c3").cast("long").alias("n_near_daily"),
        F.round(q, 4).alias("cochran_q"),
        (q > _CQ_CRIT).alias("prevalences_differ"),
    )
