"""Round-5 registry additions, batch 114 — sequential inference and
vector outlier scoring:

- q_sprt_sequential: Wald's Sequential Probability Ratio Test over the
  time-ordered purchase stream — the always-valid alternative to
  fixed-horizon A/B tests (q_ab_test): stop the MOMENT the evidence
  crosses a boundary. The log-likelihood-ratio increments are
  PRE-SCALED INTEGER literals (ln computed once in Python, not per-row
  in either engine), the running LLR is an exact integer cumsum from
  distrank.zip_scan, and the boundary-crossing comparison is
  integer-vs-integer — no float anywhere in the decision path.
- q_mahalanobis_outliers: diagonal-covariance Mahalanobis distance per
  embedding vector (Σ((v_i − μ_i)/σ_i)², per-dim stats ROUNDED before
  reuse so the downstream fold is deterministic — same policy as
  q_embedding_standardize) with the χ²(64) tail cutoff and a
  TakeOrdered top-20. The multivariate upgrade of q_zscore_outliers.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.functions import distrank
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb
from arrow_supercluster_spark.sources.tables import read_events

# SPRT configuration: H0 p=0.10 vs H1 p=0.20, alpha=beta=0.05,
# success = purchase value >= 100. Increments scaled to 1e-6 ints.
_SPRT_P0, _SPRT_P1 = 0.10, 0.20
_SPRT_ALPHA = 0.05
_SPRT_INC_S = round(math.log(_SPRT_P1 / _SPRT_P0) * 1e6)  # success
_SPRT_INC_F = round(
    math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1e6
)  # failure
_SPRT_UPPER = round(math.log((1 - _SPRT_ALPHA) / _SPRT_ALPHA) * 1e6)
_SPRT_LOWER = round(math.log(_SPRT_ALPHA / (1 - _SPRT_ALPHA)) * 1e6)

_CHI2_64_99 = 93.2168  # chi-square(64) 0.99 quantile
_MAHA_DIMS = 64


@register(
    "q_sprt_sequential",
    f"""
    WITH seq AS (
      SELECT event_id, ts,
             CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS success,
             CASE WHEN value >= 100.0 THEN {_SPRT_INC_S}
                  ELSE {_SPRT_INC_F} END AS inc
      FROM events WHERE event_type = 'purchase'
    ),
    scanned AS (
      SELECT event_id, success,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
             SUM(inc) OVER (ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS llr6
      FROM seq
    ),
    crossings AS (
      SELECT rn, llr6,
             CASE WHEN llr6 >= {_SPRT_UPPER} THEN 'accept_h1'
                  ELSE 'accept_h0' END AS decision
      FROM scanned
      WHERE llr6 >= {_SPRT_UPPER} OR llr6 <= {_SPRT_LOWER}
    ),
    first_cross AS (
      SELECT rn, llr6, decision FROM crossings ORDER BY rn LIMIT 1
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(success) AS BIGINT) AS n_success
      FROM seq
    )
    SELECT totals.n_events, totals.n_success,
           coalesce(fc.decision, 'continue') AS decision,
           CAST(coalesce(fc.rn, totals.n_events) AS BIGINT)
             AS n_at_decision,
           round(coalesce(fc.llr6,
                          (SELECT llr6 FROM scanned
                           ORDER BY rn DESC LIMIT 1)) / 1e6, 6)
             AS llr_at_decision
    FROM totals LEFT JOIN first_cross fc ON TRUE
    """,
)
def q_sprt_sequential(spark, sf_dir):
    """R339 — Wald SPRT on the ts-ordered purchase stream, H0 p={p0} vs
    H1 p={p1}, α=β={a}: LLR increments are the integer literals
    {incs}/{incf} (×1e-6; ln evaluated ONCE in Python — neither engine
    computes a log), the running LLR is distrank.zip_scan's exact
    integer cumsum (no unpartitioned window — the oracle's window form
    is the semantic twin), and the decision is the first rank where the
    integer LLR exits [{lo}, {hi}]. Early stopping is the point: the
    expected sample size under either hypothesis is far below the
    fixed-horizon test's. Output: corpus totals, decision, the stopping
    index, and the LLR there.""".format(
        p0=_SPRT_P0, p1=_SPRT_P1, a=_SPRT_ALPHA,
        incs=_SPRT_INC_S, incf=_SPRT_INC_F,
        lo=_SPRT_LOWER, hi=_SPRT_UPPER,
    )
    ev = read_events(spark, sf_dir)  # ts-ordered: needs the normalizer
    seq = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "ts",
        F.when(F.col("value") >= 100.0, 1).otherwise(0).alias("success"),
        F.when(F.col("value") >= 100.0, F.lit(_SPRT_INC_S))
        .otherwise(F.lit(_SPRT_INC_F))
        .alias("inc"),
    )
    scanned, n_rows, _ = distrank.zip_scan(
        seq, ["ts", "event_id"], out="rn0", scan_col="inc", scan_out="llr6"
    )
    scanned = scanned.select(
        (F.col("rn0") + 1).alias("rn"),
        "success",
        F.col("llr6").cast("long").alias("llr6"),
    )
    first_cross = (
        scanned.filter(
            (F.col("llr6") >= _SPRT_UPPER) | (F.col("llr6") <= _SPRT_LOWER)
        )
        .select(
            "rn",
            "llr6",
            F.when(F.col("llr6") >= _SPRT_UPPER, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
        )
        .orderBy("rn")
        .limit(1)
    )
    totals = scanned.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("success").alias("n_success"),
    )
    last_llr = scanned.orderBy(F.col("rn").desc()).limit(1).select(
        F.col("llr6").alias("last6")
    )
    return (
        totals.crossJoin(F.broadcast(last_llr))
        .join(F.broadcast(first_cross), F.lit(True), "left")
        .select(
            "n_events",
            "n_success",
            F.coalesce("decision", F.lit("continue")).alias("decision"),
            F.coalesce("rn", F.col("n_events")).cast("long").alias(
                "n_at_decision"
            ),
            F.round(
                F.coalesce("llr6", F.col("last6")) / 1e6, 6
            ).alias("llr_at_decision"),
        )
    )


@register(
    "q_mahalanobis_outliers",
    f"""
    WITH stats AS (
      SELECT pos,
             round(AVG(CAST(v AS DOUBLE)), 6) AS mu,
             round(stddev_samp(CAST(v AS DOUBLE)), 6) AS sd
      FROM (
        SELECT unnest(embedding) AS v,
               unnest(generate_series(0, len(embedding) - 1)) AS pos
      FROM embeddings
      ) t GROUP BY pos
    ),
    packed AS (
      SELECT list(mu ORDER BY pos) AS mus, list(sd ORDER BY pos) AS sds
      FROM stats
    ),
    dist AS (
      SELECT e.vec_id, e.label,
             list_sum(list_transform(range(1, {_MAHA_DIMS} + 1), i ->
               ((CAST(e.embedding[i] AS DOUBLE) - p.mus[i]) / p.sds[i])
               * ((CAST(e.embedding[i] AS DOUBLE) - p.mus[i]) / p.sds[i])))
               AS d2
      FROM embeddings e CROSS JOIN packed p
    )
    SELECT vec_id, label, round(d2, 6) AS maha_d2,
           (d2 > {_CHI2_64_99}) AS is_outlier
    FROM dist
    ORDER BY round(d2, 6) DESC, vec_id
    LIMIT 20
    """,
)
def q_mahalanobis_outliers(spark, sf_dir):
    """R340 — diagonal-covariance Mahalanobis outliers over the
    embedding corpus: per-dim (μ, σ) ROUNDED to 6dp before reuse (the
    q_embedding_standardize determinism policy — downstream arithmetic
    sees identical doubles in every engine), then d² = Σ((v−μ)/σ)² as a
    fixed-order per-row fold; χ²({d}) 0.99 cutoff flags the tail;
    TakeOrdered top-20 on the ROUNDED distance (a last-ulp tie can't
    flip the cut). Broadcast of a {d}-row stats frame + one map stage —
    the billion-vector outlier scan shape. The multivariate upgrade of
    q_zscore_outliers; diagonal Σ⁻¹ is the 100 TB-practical choice (the
    full covariance needs a d×d solve the scan doesn't).""".format(
        d=_MAHA_DIMS
    )
    from arrow_supercluster_spark.operators import centroids

    emb = _emb(spark, sf_dir)
    # |dims| rows — a structurally bounded collect (the PQ literal-table
    # pattern): the stats ride the plan as array literals so the d² fold
    # runs per-row in DIM ORDER, bit-matching the oracle's list fold
    # (a groupBy SUM over the 64 double terms would re-associate)
    stats = {
        r.pos: (r.mu, r.sd)
        for r in centroids.dimension_stats(emb)
        .select("pos", "mu", "sd")
        .collect()
    }
    mus = F.array(*[F.lit(stats[i][0]) for i in range(_MAHA_DIMS)])
    sds = F.array(*[F.lit(stats[i][1]) for i in range(_MAHA_DIMS)])
    term = lambda i: (
        (F.element_at("embedding", i).cast("double") - F.element_at(mus, i))
        / F.element_at(sds, i)
    )
    d2_col = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(_MAHA_DIMS)),
            lambda i: term(i) * term(i),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    d2 = emb.select("vec_id", "label", d2_col.alias("d2"))
    return (
        d2.select(
            "vec_id",
            "label",
            F.round("d2", 6).alias("maha_d2"),
            (F.col("d2") > _CHI2_64_99).alias("is_outlier"),
        )
        .orderBy(F.col("maha_d2").desc(), "vec_id")
        .limit(20)
    )
