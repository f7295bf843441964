"""Round-7 registry additions, batch 168 — tabular feature-engineering
transforms a training pipeline runs before any model sees the data:

- q_normal_scores: rank-based inverse-normal transform (van der
  Waerden / "RankGauss") of the per-user activity score — global rank
  via the DISTRIBUTED zip_scan (functions/distrank.py, never a global
  window), p = (rank+0.5)/n, then Φ⁻¹(p) via the Beasley-Springer-
  Moro rational approximation emitted as the IDENTICAL arithmetic in
  both engines (the Spark Column tree and the SQL string are generated
  from the same coefficient tuples).
- q_robust_scaler: per-language median/IQR location-scale summary of
  document lengths plus the |scaled| > 2 outlier count — the scaler
  that survives the heavy tails min-max dies on.
- q_quantile_normalize: cross-source quantile normalization of doc
  lengths (each rank maps to the cross-source mean at that rank — the
  microarray technique): per-source ranks come from ONE global
  zip_scan sorted (source, len, doc_id) minus per-source offsets
  (sources are contiguous in that order), so the plan has no
  per-source single-reducer window either.

At 100 TB: zip_scan is two Arrow passes with one tiny per-partition
summary row each; everything else is groupBy/broadcast-join algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.functions.distrank import zip_scan
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.plans.registry_ext55 import (
    _SQL_SCORED,
    _spark_scored,
)

# Beasley-Springer-Moro probit coefficients (Moro 1995) — public.
_BSM_A = (2.50662823884, -18.61500062529, 41.39119773534, -25.44106049637)
_BSM_B = (-8.47351093090, 23.08336743743, -21.06224101826, 3.13082909833)
_BSM_C = (
    0.3374754822726147, 0.9761690190917186, 0.1607979714918209,
    0.0276438810333863, 0.0038405729373609, 0.0003951896511919,
    0.0000321767881768, 0.0000002888167364, 0.0000003960315187,
)


def bsm_probit_sql(p: str) -> str:
    """Φ⁻¹({p}) as a DuckDB expression string (BSM approximation)."""
    u = f"({p} - 0.5)"
    r = f"({u} * {u})"
    a0, a1, a2, a3 = _BSM_A
    b0, b1, b2, b3 = _BSM_B
    central = (
        f"{u} * ((({a3} * {r} + {a2}) * {r} + {a1}) * {r} + {a0}) / "
        f"(((({b3} * {r} + {b2}) * {r} + {b1}) * {r} + {b0}) * {r} + 1.0)"
    )
    rr = f"(CASE WHEN {p} < 0.5 THEN {p} ELSE 1.0 - {p} END)"
    s = f"ln(-ln({rr}))"
    horner = str(_BSM_C[-1])
    for c in reversed(_BSM_C[:-1]):
        horner = f"({c} + {s} * {horner})"
    tail = f"(CASE WHEN {p} < 0.5 THEN -1.0 ELSE 1.0 END) * {horner}"
    return (
        f"CASE WHEN abs({u}) <= 0.42 THEN {central} ELSE {tail} END"
    )


def bsm_probit_col(p):
    """Φ⁻¹(p) as a Spark Column — same arithmetic as bsm_probit_sql."""
    u = p - 0.5
    r = u * u
    a0, a1, a2, a3 = _BSM_A
    b0, b1, b2, b3 = _BSM_B
    central = (
        u * (((a3 * r + a2) * r + a1) * r + a0)
        / ((((b3 * r + b2) * r + b1) * r + b0) * r + 1.0)
    )
    rr = F.when(p < 0.5, p).otherwise(1.0 - p)
    s = F.log(-F.log(rr))
    horner = F.lit(_BSM_C[-1])
    for c in reversed(_BSM_C[:-1]):
        horner = c + s * horner
    tail = F.when(p < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0)) * horner
    return F.when(F.abs(u) <= 0.42, central).otherwise(tail)


# ===========================================================================
# R501 — rank-based inverse-normal transform
# ===========================================================================

@register(
    "q_normal_scores",
    f"""
    WITH {_SQL_SCORED},
    ranked AS (
      SELECT user_id, score,
             ROW_NUMBER() OVER (ORDER BY score, user_id) - 1 AS idx,
             COUNT(*) OVER () AS n
      FROM scored
    ),
    ps AS (
      SELECT user_id, score, (idx + 0.5) / n AS p FROM ranked
    )
    SELECT user_id, score, round({bsm_probit_sql('p')}, 6) AS z
    FROM ps ORDER BY user_id
    """,
)
def q_normal_scores(spark, sf_dir):
    """R501 — van der Waerden / RankGauss normal scores of the
    per-user activity score: global (score, user_id) rank from the
    distributed zip_scan (NOT a global window — the oracle's
    ROW_NUMBER is the semantic twin only), p = (rank+0.5)/n, then the
    BSM probit whose Column tree and SQL string come from the same
    coefficient tuples, so both engines run the identical IEEE double
    arithmetic before the 6-digit round. The transform every
    tree/linear baseline wants for heavy-tailed features."""
    s = _spark_scored(spark, sf_dir)
    ranked, n, _ = zip_scan(s, ["score", "user_id"], out="idx")
    p = (F.col("idx") + 0.5) / F.lit(float(n))
    return ranked.select(
        "user_id", "score", F.round(bsm_probit_col(p), 6).alias("z")
    ).orderBy("user_id")


# ===========================================================================
# R502 — robust (median/IQR) scaler summary
# ===========================================================================

@register(
    "q_robust_scaler",
    """
    WITH stats AS (
      SELECT lang,
             quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.5) AS med,
             quantile_cont(n_chars, 0.75) AS q3
      FROM documents GROUP BY lang
    )
    SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(stats.med, 4) AS median,
           round(stats.q3 - stats.q1, 4) AS iqr,
           CAST(SUM(CASE WHEN abs((d.n_chars - stats.med)
                                  / (stats.q3 - stats.q1)) > 2
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(AVG(abs((d.n_chars - stats.med)
                         / (stats.q3 - stats.q1))), 6) AS avg_abs_scaled
    FROM documents d JOIN stats ON d.lang = stats.lang
    GROUP BY d.lang, stats.med, stats.q1, stats.q3
    ORDER BY d.lang
    """,
)
def q_robust_scaler(spark, sf_dir):
    """R502 — robust scaling summary of document length per language:
    scaled = (len − median) / IQR, with the median/IQR from exact
    interpolated percentiles (the q_group_quantiles parity surface),
    the |scaled| > 2 outlier count, and the mean absolute scaled
    magnitude. Plan: one per-lang percentile agg (bounded output)
    broadcast back against the corpus — the corpus never re-shuffles."""
    docs = _docs(spark, sf_dir)
    stats = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.25)").alias("q1"),
        F.expr("percentile(n_chars, 0.5)").alias("med"),
        F.expr("percentile(n_chars, 0.75)").alias("q3"),
    )
    scaled = F.abs(
        (F.col("n_chars") - F.col("med")) / (F.col("q3") - F.col("q1"))
    )
    return (
        docs.join(F.broadcast(stats), "lang")
        .groupBy("lang", "med", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(scaled > 2, 1).otherwise(0)).cast("long")
            .alias("n_outliers"),
            F.round(F.avg(scaled), 6).alias("avg_abs_scaled"),
        )
        .select(
            "lang", "n_docs",
            F.round("med", 4).alias("median"),
            F.round(F.col("q3") - F.col("q1"), 4).alias("iqr"),
            "n_outliers", "avg_abs_scaled",
        )
        .orderBy("lang")
    )


# ===========================================================================
# R503 — cross-source quantile normalization
# ===========================================================================

@register(
    "q_quantile_normalize",
    """
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id) - 1 AS r
      FROM documents
    ),
    ref AS (
      SELECT r, AVG(n_chars) AS ref_val FROM ranked GROUP BY r
    )
    SELECT ranked.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(AVG(ranked.n_chars), 4) AS mean_before,
           round(AVG(ref.ref_val), 4) AS mean_after
    FROM ranked JOIN ref ON ranked.r = ref.r
    GROUP BY ranked.source ORDER BY ranked.source
    """,
)
def q_quantile_normalize(spark, sf_dir):
    """R503 — quantile normalization of doc lengths across sources
    (each within-source rank maps to the cross-source MEAN length at
    that rank; unequal source sizes average over the sources that
    reach the rank — stated variant of the equal-length microarray
    form). Per-source ranks come from ONE global zip_scan ordered
    (source, n_chars, doc_id) minus each source's first global rank —
    sources are contiguous under that sort, so the subtraction IS the
    within-source ROW_NUMBER and the plan never funnels a source
    through one reducer. Output: per-source means before/after (the
    'after' means converge toward each other — asserted in tests)."""
    docs = _docs(spark, sf_dir).select("source", "n_chars", "doc_id")
    ranked, _, _ = zip_scan(
        docs, ["source", "n_chars", "doc_id"], out="gidx"
    )
    offs = ranked.groupBy("source").agg(F.min("gidx").alias("off"))
    local = ranked.join(F.broadcast(offs), "source").select(
        "source", "n_chars", (F.col("gidx") - F.col("off")).alias("r")
    )
    ref = local.groupBy("r").agg(F.avg("n_chars").alias("ref_val"))
    return (
        local.join(ref, "r")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("mean_before"),
            F.round(F.avg("ref_val"), 4).alias("mean_after"),
        )
        .orderBy("source")
    )
