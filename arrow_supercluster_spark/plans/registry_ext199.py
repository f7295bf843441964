"""Round-7 registry additions, batch 194 — representation diagnostics
(the embedding-quality readouts a retrieval/training pipeline monitors):

- q_linear_cka: linear Centered Kernel Alignment (Kornblith et al.
  2019) between two views of the embedding table — dims 1-32 vs dims
  33-64: CKA = ||X̄ᵀȲ||_F² / (||X̄ᵀX̄||_F·||ȲᵀȲ||_F).  Centering is
  applied ANALYTICALLY (m_ab = Σe_a e_b − S_a S_b/n), so the moment
  pass folds exact integers (elements pre-scaled ×1e6).
- q_anisotropy: Ethayarajh-style anisotropy — the exact mean pairwise
  cosine of all n(n−1) vector pairs WITHOUT a pair join, via the sum
  identity Σ_{i≠j} uᵢ·uⱼ = ||Σu||² − Σ||u||² on unit-normalized,
  integer-scaled vectors.  O(nd), not O(n²d).
- q_participation_ratio: the variance-spectrum effective
  dimensionality PR = (Σ var_d)²/Σ var_d² over per-dimension variances
  (exact integer moments), plus the top-dimension variance share.

At 100 TB: anisotropy and PR are one explode×d pass with map-side
partial aggregation (shuffle carries ≤d partials per partition); the
CKA moment pass explodes d(d+1)/2 = 2080 pairs per row — a CPU-side
×2080 factor with the same tiny shuffle; the BLAS mapInPandas kernels
(operators/similarity.py GEMM path) are the drop-in when the moment
pass dominates.  Every cross-row sum folds integers; doubles appear
only in the final closed forms; outputs round to 4-6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb

_EMB_D = 64
_EMB_SPLIT = 32  # X = dims 1..32, Y = dims 33..64
_EMB_SCALE = 1e6

# floor(x+0.5), not round(): the engines' round() half-way rules
# disagree on some float32 inputs (caught by the moment cross-check);
# floor is rule-identical everywhere
_SQL_EINT = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
    f" * {_EMB_SCALE} + 0.5) AS BIGINT))"
)


def _eint_col():
    return F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * _EMB_SCALE + 0.5).cast(
            "long"
        ),
    )


# ===========================================================================
# R578 — linear CKA between the two embedding half-views
# ===========================================================================

@register(
    "q_linear_cka",
    f"""
    WITH e AS (SELECT {_SQL_EINT} AS v FROM embeddings),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
    expl AS (
      SELECT v, unnest(generate_series(1, {_EMB_D})) AS a FROM e
    ),
    firsts AS (
      SELECT a, CAST(SUM(v[a]) AS BIGINT) AS s1 FROM expl GROUP BY 1
    ),
    pairs AS (
      SELECT a, unnest(generate_series(a, {_EMB_D})) AS b, v FROM expl
    ),
    seconds AS (
      SELECT a, b, CAST(SUM(v[a] * v[b]) AS BIGINT) AS s2
      FROM pairs GROUP BY 1, 2
    ),
    m AS (
      SELECT s.a, s.b,
             s.s2 - CAST(fa.s1 AS DOUBLE) * fb.s1 / n.n AS mc
      FROM seconds s
      JOIN firsts fa ON fa.a = s.a
      JOIN firsts fb ON fb.a = s.b
      CROSS JOIN n
    ),
    -- fixed-order folds over the 2080-pair frame: identical
    -- association in both engines (mc² terms are not integers)
    blocks AS (
      SELECT
        list_aggregate(list(CASE WHEN b <= {_EMB_SPLIT}
                 THEN mc * mc * (CASE WHEN a = b THEN 1 ELSE 2 END)
                 ELSE 0.0 END ORDER BY a, b), 'sum') AS fxx2,
        list_aggregate(list(CASE WHEN a > {_EMB_SPLIT}
                 THEN mc * mc * (CASE WHEN a = b THEN 1 ELSE 2 END)
                 ELSE 0.0 END ORDER BY a, b), 'sum') AS fyy2,
        list_aggregate(list(CASE WHEN a <= {_EMB_SPLIT}
                             AND b > {_EMB_SPLIT}
                 THEN mc * mc ELSE 0.0 END ORDER BY a, b), 'sum')
          AS fxy2
      FROM m
    )
    SELECT n, round(fxy2 / (sqrt(fxx2) * sqrt(fyy2)), 6) AS linear_cka
    FROM blocks CROSS JOIN n
    """,
)
def q_linear_cka(spark, sf_dir):
    """R578 — CKA(X, Y) with X/Y the first/last 32 dims: centered
    cross-moments m_ab = Σe_a e_b − S_a S_b/n from ONE symmetric
    (a ≤ b) integer moment pass; block Frobenius norms assemble via
    conditional sums with the ×2 off-diagonal factor on the symmetric
    blocks.  CKA ∈ (0, 1]; ~0 means the halves encode independent
    subspaces."""
    e = _emb(spark, sf_dir).select(_eint_col().alias("v"))
    n = e.agg(F.count(F.lit(1)).alias("n"))
    expl = e.select(
        "v", F.explode(F.sequence(F.lit(1), F.lit(_EMB_D))).alias("a")
    )
    firsts = expl.groupBy("a").agg(
        F.sum(F.element_at("v", F.col("a"))).alias("s1")
    )
    pairs = expl.select(
        "v",
        "a",
        F.explode(F.sequence(F.col("a"), F.lit(_EMB_D))).alias("b"),
    )
    seconds = pairs.groupBy("a", "b").agg(
        F.sum(
            F.element_at("v", F.col("a")) * F.element_at("v", F.col("b"))
        ).alias("s2")
    )
    fa = firsts.select(F.col("a").alias("fa_a"), F.col("s1").alias("s1a"))
    fb = firsts.select(F.col("a").alias("fb_a"), F.col("s1").alias("s1b"))
    m = (
        seconds.join(F.broadcast(fa), F.col("fa_a") == F.col("a"))
        .join(F.broadcast(fb), F.col("fb_a") == F.col("b"))
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            (
                F.col("s2")
                - F.col("s1a").cast("double")
                * F.col("s1b")
                / F.col("n")
            ).alias("mc"),
        )
    )
    sym = F.when(F.col("a") == F.col("b"), 1).otherwise(2)
    txx = F.when(
        F.col("b") <= _EMB_SPLIT, F.col("mc") * F.col("mc") * sym
    ).otherwise(0.0)
    tyy = F.when(
        F.col("a") > _EMB_SPLIT, F.col("mc") * F.col("mc") * sym
    ).otherwise(0.0)
    txy = F.when(
        (F.col("a") <= _EMB_SPLIT) & (F.col("b") > _EMB_SPLIT),
        F.col("mc") * F.col("mc"),
    ).otherwise(0.0)
    terms = m.select(
        "a", "b", txx.alias("txx"), tyy.alias("tyy"), txy.alias("txy")
    )

    def fold(field):
        lst = F.transform(
            F.sort_array(
                F.collect_list(F.struct("a", "b", "txx", "tyy", "txy"))
            ),
            lambda r: r[field],
        )
        return F.aggregate(lst, F.lit(0.0), lambda acc, x: acc + x)

    blocks = terms.agg(
        fold("txx").alias("fxx2"),
        fold("tyy").alias("fyy2"),
        fold("txy").alias("fxy2"),
    )
    return blocks.crossJoin(F.broadcast(n)).select(
        "n",
        F.round(
            F.col("fxy2")
            / (F.sqrt(F.col("fxx2")) * F.sqrt(F.col("fyy2"))),
            6,
        ).alias("linear_cka"),
    )


# ===========================================================================
# R579 — exact mean pairwise cosine without a pair join
# ===========================================================================

_SQL_UNORM = (
    "sqrt(list_aggregate(list_transform(embedding, x -> "
    "CAST(x AS DOUBLE) * x), 'sum'))"
)
_SQL_UINT = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
    f" / ({_SQL_UNORM}) * {_EMB_SCALE} + 0.5) AS BIGINT))"
)


@register(
    "q_anisotropy",
    f"""
    WITH u AS (SELECT {_SQL_UINT} AS v FROM embeddings),
    per_row AS (
      SELECT v,
             CAST(list_aggregate(list_transform(v, x -> x * x), 'sum')
                  AS BIGINT) AS nrm2
      FROM u
    ),
    dims AS (
      SELECT a, CAST(SUM(v[a]) AS BIGINT) AS s
      FROM (SELECT v, unnest(generate_series(1, {_EMB_D})) AS a
            FROM per_row)
      GROUP BY 1
    ),
    agg AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM per_row) AS n,
             (SELECT CAST(SUM(nrm2) AS BIGINT) FROM per_row) AS sum_n2,
             -- fixed-order fold by dim: identical association in both
             -- engines (s is exact integer; s*s may exceed 2^53)
             (SELECT list_aggregate(
                list_transform(list(CAST(s AS DOUBLE) ORDER BY a),
                               x -> x * x), 'sum')
              FROM dims) AS s2
    )
    SELECT n,
           round((s2 - sum_n2) / (CAST(n AS DOUBLE) * (n - 1))
                 / {_EMB_SCALE * _EMB_SCALE!r}, 6) AS mean_pairwise_cos
    FROM agg
    """,
)
def q_anisotropy(spark, sf_dir):
    """R579 — mean cos over ALL n(n−1) ordered pairs of unit vectors
    via Σ_{{i≠j}} uᵢ·uⱼ = ||Σu||² − Σ||u||²: one explode×d pass, no
    pair join.  High values (≫0) = anisotropic cone (Ethayarajh
    2019); vectors are unit-normalized per row (fixed-order fold)
    then integer-scaled so cross-row sums are exact."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(
                "embedding", lambda x: x.cast("double") * x
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    u = _emb(spark, sf_dir).select(
        F.transform(
            "embedding",
            lambda x: F.floor(
                x.cast("double") / norm * _EMB_SCALE + 0.5
            ).cast("long"),
        ).alias("v")
    )
    per_row = u.select(
        "v",
        F.aggregate(
            F.transform("v", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("nrm2"),
    )
    dims = (
        per_row.select(
            "v",
            F.explode(F.sequence(F.lit(1), F.lit(_EMB_D))).alias("a"),
        )
        .groupBy("a")
        .agg(F.sum(F.element_at("v", F.col("a"))).alias("s"))
    )
    tot = per_row.agg(
        F.count(F.lit(1)).alias("n"), F.sum("nrm2").alias("sum_n2")
    )
    s_sorted = F.transform(
        F.sort_array(
            F.collect_list(
                F.struct("a", F.col("s").cast("double").alias("sd"))
            )
        ),
        lambda r: r.sd,
    )
    s2 = dims.agg(
        F.aggregate(
            F.transform(s_sorted, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s2")
    )
    return tot.crossJoin(F.broadcast(s2)).select(
        "n",
        F.round(
            (F.col("s2") - F.col("sum_n2"))
            / (F.col("n").cast("double") * (F.col("n") - 1))
            / (_EMB_SCALE * _EMB_SCALE),
            6,
        ).alias("mean_pairwise_cos"),
    )


# ===========================================================================
# R580 — variance-spectrum participation ratio
# ===========================================================================

@register(
    "q_participation_ratio",
    f"""
    WITH e AS (SELECT {_SQL_EINT} AS v FROM embeddings),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
    dims AS (
      SELECT a, CAST(SUM(v[a]) AS BIGINT) AS s1,
             CAST(SUM(v[a] * v[a]) AS BIGINT) AS s2
      FROM (SELECT v, unnest(generate_series(1, {_EMB_D})) AS a FROM e)
      GROUP BY 1
    ),
    vars_ AS (
      SELECT a,
             (s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
               / {_EMB_SCALE * _EMB_SCALE!r} AS var_d
      FROM dims CROSS JOIN n
    ),
    -- fixed-order folds (by dim) so both engines associate identically
    agg AS (
      SELECT list_aggregate(list(var_d ORDER BY a), 'sum') AS tv,
             list_aggregate(list_transform(list(var_d ORDER BY a),
                                           x -> x * x), 'sum') AS tv2,
             MAX(var_d) AS mv
      FROM vars_
    )
    SELECT n, {_EMB_D} AS d,
           round(tv * tv / tv2, 4) AS participation_ratio,
           round(mv / tv, 6) AS top_var_share,
           round(tv, 6) AS total_var
    FROM agg CROSS JOIN n
    """,
)
def q_participation_ratio(spark, sf_dir):
    """R580 — PR = (Σ var_d)²/Σ var_d² over the per-dimension variance
    spectrum (the diagonal proxy for eigenvalue participation; PR = d
    iff isotropic, →1 iff one dimension dominates), plus the top
    dimension's variance share.  One explode×d integer-moment pass."""
    e = _emb(spark, sf_dir).select(_eint_col().alias("v"))
    n = e.agg(F.count(F.lit(1)).alias("n"))
    dims = (
        e.select(
            "v",
            F.explode(F.sequence(F.lit(1), F.lit(_EMB_D))).alias("a"),
        )
        .groupBy("a")
        .agg(
            F.sum(F.element_at("v", F.col("a"))).alias("s1"),
            F.sum(
                F.element_at("v", F.col("a"))
                * F.element_at("v", F.col("a"))
            ).alias("s2"),
        )
    )
    var_d = (
        (
            F.col("s2")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n")
        )
        / (F.col("n") - 1)
        / (_EMB_SCALE * _EMB_SCALE)
    )
    vars_ = dims.crossJoin(F.broadcast(n)).select(
        "a", var_d.alias("var_d")
    )
    lst = F.transform(
        F.sort_array(F.collect_list(F.struct("a", "var_d"))),
        lambda s: s.var_d,
    )
    agg = vars_.agg(
        F.aggregate(
            lst, F.lit(0.0), lambda acc, x: acc + x
        ).alias("tv"),
        F.aggregate(
            F.transform(lst, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("tv2"),
        F.max("var_d").alias("mv"),
    )
    return agg.crossJoin(F.broadcast(n)).select(
        "n",
        F.lit(_EMB_D).alias("d"),
        F.round(F.col("tv") * F.col("tv") / F.col("tv2"), 4).alias(
            "participation_ratio"
        ),
        F.round(F.col("mv") / F.col("tv"), 6).alias("top_var_share"),
        F.round("tv", 6).alias("total_var"),
    )
