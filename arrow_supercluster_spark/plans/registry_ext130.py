"""Round-5 registry additions, batch 125 — clustering agreement,
survival comparison, and split-quality auditing:

- q_ari_clustering: Adjusted Rand Index between the true embedding
  labels and the nearest-centroid assignment — the chance-corrected
  pair-counting agreement metric (ARI 0 ≈ random, 1 = identical).
  Builds on the q_nearest_centroid confusion table; every term is an
  integer binomial, so ARI is exact up to one final division.
- q_logrank_test: two-group log-rank test on time-to-first-purchase
  (groups = user parity, censoring at the corpus horizon) — the
  standard "are these survival curves different" statistic above
  q_kaplan_meier's single-curve estimate. At-risk counts come from a
  death-days ≥-join against the durations (the per-group cumsum form
  silently dropped groups with no same-day ending — the python oracle
  caught it pre-commit); the O−E and variance terms integer-scale
  before summing.
- q_adversarial_validation: the train/holdout leak detector — can a
  1-feature threshold rule distinguish the split sides? For the HASH
  split (q_holdout_split's) the best balanced accuracy should sit at
  ~0.5 (indistinguishable = healthy); for a deliberately bad
  BY-SOURCE split it rises far above. Both measured with the same
  17-threshold stump sweep over n_chars.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs, _emb

_LR_SCALE = 1_000_000_000
_AV_THRESHOLDS = tuple(range(100, 1800, 100))


# ===========================================================================
# R369 — Adjusted Rand Index
# ===========================================================================

@register(
    "q_ari_clustering",
    """
    WITH cents AS (
      SELECT label AS c_label, list(av ORDER BY pos) AS centroid
      FROM (
        SELECT label, pos, round(AVG(v), 6) AS av FROM (
          SELECT label,
                 unnest(embedding) AS v,
                 unnest(generate_series(0, len(embedding) - 1)) AS pos
          FROM embeddings
        ) x GROUP BY 1, 2
      ) y GROUP BY 1
    ),
    scored AS (
      SELECT e.vec_id, e.label AS true_label, c.c_label,
             round(list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid)
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(c.centroid, c.centroid))),
                   6) AS sim
      FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, true_label, c_label AS pred
      FROM (
        SELECT vec_id, true_label, c_label,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, c_label) AS rk
        FROM scored
      ) WHERE rk = 1
    ),
    cont AS (
      SELECT true_label, pred, CAST(COUNT(*) AS BIGINT) AS nij
      FROM assigned GROUP BY 1, 2
    ),
    sums AS (
      SELECT SUM(nij * (nij - 1) / 2) AS sum_ij,
             SUM(nij) AS n
      FROM cont
    ),
    arow AS (
      SELECT SUM(a * (a - 1) / 2) AS sum_a
      FROM (SELECT SUM(nij) AS a FROM cont GROUP BY true_label)
    ),
    bcol AS (
      SELECT SUM(b * (b - 1) / 2) AS sum_b
      FROM (SELECT SUM(nij) AS b FROM cont GROUP BY pred)
    )
    SELECT CAST(sums.n AS BIGINT) AS n_points,
           CAST(sums.sum_ij AS BIGINT) AS sum_ij,
           CAST(arow.sum_a AS BIGINT) AS sum_a,
           CAST(bcol.sum_b AS BIGINT) AS sum_b,
           round((sums.sum_ij
                  - arow.sum_a * bcol.sum_b * 1.0
                    / (sums.n * (sums.n - 1) / 2))
                 / ((arow.sum_a + bcol.sum_b) / 2.0
                    - arow.sum_a * bcol.sum_b * 1.0
                      / (sums.n * (sums.n - 1) / 2)), 6) AS ari
    FROM sums CROSS JOIN arow CROSS JOIN bcol
    """,
)
def q_ari_clustering(spark, sf_dir):
    """R369 — Adjusted Rand Index between the true labels and the
    nearest-centroid clustering: ARI = (Σ C(nij,2) − E)/(½(Σa+Σb) − E)
    with E = ΣC(a,2)·ΣC(b,2)/C(n,2) — all pair counts are exact
    integer binomials off the (true, predicted) contingency (built the
    q_nearest_centroid way: rounded centroids broadcast, per-row
    fixed-order cosine fold, argmax with label tie-break). ARI's
    chance correction is what raw accuracy lacks when cluster ids are
    arbitrary. One confusion agg + closed form."""
    from arrow_supercluster_spark.operators import centroids

    emb = _emb(spark, sf_dir)
    cents = centroids.label_centroids(emb)
    # nearest_centroid already RETURNS the confusion counts
    cont = centroids.nearest_centroid(emb, cents).select(
        F.col("label").alias("true_label"),
        F.col("assigned").alias("pred"),
        F.col("n_vecs").alias("nij"),
    )
    sums = cont.agg(
        F.sum(F.col("nij") * (F.col("nij") - 1) / 2).cast("long").alias(
            "sum_ij"
        ),
        F.sum("nij").alias("n"),
    )
    arow = (
        cont.groupBy("true_label")
        .agg(F.sum("nij").alias("a"))
        .agg(
            F.sum(F.col("a") * (F.col("a") - 1) / 2).cast("long").alias(
                "sum_a"
            )
        )
    )
    bcol = (
        cont.groupBy("pred")
        .agg(F.sum("nij").alias("b"))
        .agg(
            F.sum(F.col("b") * (F.col("b") - 1) / 2).cast("long").alias(
                "sum_b"
            )
        )
    )
    e = (
        F.col("sum_a")
        * F.col("sum_b")
        * 1.0
        / (F.col("n") * (F.col("n") - 1) / 2)
    )
    return (
        sums.crossJoin(F.broadcast(arow))
        .crossJoin(F.broadcast(bcol))
        .select(
            F.col("n").cast("long").alias("n_points"),
            F.col("sum_ij").alias("sum_ij"),
            "sum_a",
            "sum_b",
            F.round(
                (F.col("sum_ij") - e)
                / ((F.col("sum_a") + F.col("sum_b")) / 2.0 - e),
                6,
            ).alias("ari"),
        )
    )


# ===========================================================================
# R370 — two-group log-rank test
# ===========================================================================

@register(
    "q_logrank_test",
    f"""
    WITH firsts AS (
      SELECT user_id, user_id % 2 AS grp,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(strftime(ts, '%d') AS INTEGER) END) AS tday
      FROM events GROUP BY user_id
    ),
    durations AS (
      SELECT grp,
             coalesce(tday, 31) AS t,
             CASE WHEN tday IS NULL THEN 0 ELSE 1 END AS event
      FROM firsts
    ),
    death_days AS (
      SELECT DISTINCT t FROM durations WHERE event = 1
    ),
    deaths AS (
      SELECT t,
             CAST(SUM(CASE WHEN grp = 1 THEN event ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(SUM(event) AS BIGINT) AS dt
      FROM durations GROUP BY t
    ),
    risk AS (
      -- at-risk per (death day, group) via the >= join: a group with no
      -- duration ENDING at t still contributes its surviving members
      SELECT dd.t,
             CAST(SUM(CASE WHEN dur.grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(COUNT(*) AS BIGINT) AS nt
      FROM death_days dd JOIN durations dur ON dur.t >= dd.t
      GROUP BY dd.t
    ),
    times AS (
      SELECT risk.t, deaths.d1, deaths.dt, risk.n1, risk.nt
      FROM risk JOIN deaths ON risk.t = deaths.t
      WHERE deaths.dt > 0 AND risk.nt > deaths.dt
    ),
    terms AS (
      SELECT
        CAST(round((d1 - dt * 1.0 * n1 / nt) * {_LR_SCALE}) AS BIGINT)
          AS oe,
        CAST(round(dt * (n1 * 1.0 / nt) * (1.0 - n1 * 1.0 / nt)
                   * (nt - dt) / (nt - 1) * {_LR_SCALE}) AS BIGINT) AS vr
      FROM times
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
           round(SUM(oe) * 1.0 / {_LR_SCALE}, 4) AS o_minus_e,
           round(SUM(vr) * 1.0 / {_LR_SCALE}, 4) AS variance,
           round((SUM(oe) * 1.0 / {_LR_SCALE})
                 * (SUM(oe) * 1.0 / {_LR_SCALE})
                 / (SUM(vr) * 1.0 / {_LR_SCALE}), 4) AS chi2
    FROM terms
    """,
)
def q_logrank_test(spark, sf_dir):
    """R370 — two-group log-rank test on time-to-first-purchase (grp =
    user parity; non-purchasers censor at day 31): at each death day,
    O−E = d₁ − d·n₁/n and the hypergeometric variance accumulate as
    integer-scaled terms (day order can't move the sums); χ² =
    (ΣO−E)²/ΣV on 1 df. At-risk counts are a REVERSE running sum over
    the per-(group, day) table — a window partitioned by group over
    ≤31 rows, never the event grain. The curve-comparison half of
    survival analysis (q_kaplan_meier estimates one curve; this tests
    two)."""
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.dayofmonth("ts")
            )
        ).alias("tday")
    )
    durations = firsts.select(
        (F.col("user_id") % 2).alias("grp"),
        F.coalesce("tday", F.lit(31)).alias("t"),
        F.when(F.col("tday").isNull(), 0).otherwise(1).alias("event"),
    )
    death_days = (
        durations.filter(F.col("event") == 1).select("t").distinct()
    )
    deaths = durations.groupBy("t").agg(
        F.sum(
            F.when(F.col("grp") == 1, F.col("event")).otherwise(0)
        ).alias("d1"),
        F.sum("event").alias("dt"),
    )
    # at-risk per (death day, group) via the >= join — a group with no
    # duration ENDING at t still contributes its surviving members (the
    # per-group reverse-cumsum form silently dropped those rows; caught
    # by the python oracle before commit)
    dd = death_days.select(F.col("t").alias("dt_day"))
    risk = (
        dd.join(durations, durations["t"] >= dd["dt_day"])
        .groupBy("dt_day")
        .agg(
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1"),
            F.count(F.lit(1)).alias("nt"),
        )
    )
    times = (
        risk.join(deaths, risk["dt_day"] == deaths["t"])
        .filter((F.col("dt") > 0) & (F.col("nt") > F.col("dt")))
        .select("d1", "dt", "n1", "nt")
    )
    oe = F.round(
        (F.col("d1") - F.col("dt") * 1.0 * F.col("n1") / F.col("nt"))
        * _LR_SCALE
    ).cast("long")
    vr = F.round(
        F.col("dt")
        * (F.col("n1") * 1.0 / F.col("nt"))
        * (1.0 - F.col("n1") * 1.0 / F.col("nt"))
        * (F.col("nt") - F.col("dt"))
        / (F.col("nt") - 1)
        * _LR_SCALE
    ).cast("long")
    terms = times.select(oe.alias("oe"), vr.alias("vr"))
    s_oe = F.sum("oe") * 1.0 / _LR_SCALE
    s_vr = F.sum("vr") * 1.0 / _LR_SCALE
    return terms.agg(
        F.count(F.lit(1)).alias("n_times"),
        F.round(s_oe, 4).alias("o_minus_e"),
        F.round(s_vr, 4).alias("variance"),
        F.round(s_oe * s_oe / s_vr, 4).alias("chi2"),
    )


# ===========================================================================
# R371 — adversarial validation (split-quality audit)
# ===========================================================================

_SQL_AV_SPLIT = {
    "hash": "(hash(doc_id) % 10 = 0)",
    "by_source": "(source IN ('src0', 'src1'))",
}


def _sql_av() -> str:
    # portable "hash": the affine map both engines share
    parts = []
    for name, _ in _SQL_AV_SPLIT.items():
        label = (
            "((doc_id % 2147483647) * 2654435761 + 12345) % 2147483647 % 10 = 0"
            if name == "hash"
            else "source IN ('src0', 'src1')"
        )
        parts.append(f"""
      SELECT '{name}' AS split, t.thr,
             SUM(CASE WHEN ({label}) AND n_chars >= t.thr
                      THEN 1 ELSE 0 END) * 0.5
               / nullif(SUM(CASE WHEN ({label}) THEN 1 ELSE 0 END), 0)
             + SUM(CASE WHEN NOT ({label}) AND n_chars < t.thr
                        THEN 1 ELSE 0 END) * 0.5
               / nullif(SUM(CASE WHEN NOT ({label}) THEN 1 ELSE 0 END), 0)
               AS bacc
      FROM documents
      CROSS JOIN (SELECT unnest({list(_AV_THRESHOLDS)}) AS thr) t
      GROUP BY t.thr""")
    union = " UNION ALL ".join(parts)
    return f"""
    WITH accs AS ({union})
    SELECT split,
           round(MAX(greatest(bacc, 1.0 - bacc)), 6) AS best_bacc
    FROM accs
    GROUP BY split
    ORDER BY split
    """


@register("q_adversarial_validation", _sql_av())
def q_adversarial_validation(spark, sf_dir):
    """R371 — adversarial validation: can a threshold rule on n_chars
    tell the holdout from the train side? For the portable-hash split,
    the best balanced accuracy over {t} thresholds (taking each rule
    or its complement) should hover at ~0.5 — the sides are
    indistinguishable, the split is healthy. For the deliberately bad
    BY-SOURCE split it rises — source correlates with length, so the
    holdout is distribution-shifted. The leak/shift audit every
    train/eval split should pass before metrics are trusted; exact
    integer counts throughout.""".format(t=len(_AV_THRESHOLDS))
    docs = _docs(spark, sf_dir)
    out = None
    for name in _SQL_AV_SPLIT:
        if name == "hash":
            lbl = (
                (
                    F.pmod("doc_id", F.lit(2147483647)) * 2654435761
                    + 12345
                )
                % 2147483647
                % 10
                == 0
            )
        else:
            lbl = F.col("source").isin("src0", "src1")
        tagged = docs.select(
            lbl.alias("is_b"), "n_chars",
            F.explode(
                F.array(*[F.lit(t) for t in _AV_THRESHOLDS])
            ).alias("thr"),
        )
        accs = tagged.groupBy("thr").agg(
            (
                F.sum(
                    F.when(
                        F.col("is_b") & (F.col("n_chars") >= F.col("thr")),
                        1,
                    ).otherwise(0)
                )
                * 0.5
                / F.sum(F.when(F.col("is_b"), 1).otherwise(0))
                + F.sum(
                    F.when(
                        (~F.col("is_b"))
                        & (F.col("n_chars") < F.col("thr")),
                        1,
                    ).otherwise(0)
                )
                * 0.5
                / F.sum(F.when(~F.col("is_b"), 1).otherwise(0))
            ).alias("bacc")
        )
        row = accs.agg(
            F.lit(name).alias("split"),
            F.round(
                F.max(F.greatest(F.col("bacc"), 1.0 - F.col("bacc"))), 6
            ).alias("best_bacc"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("split")
