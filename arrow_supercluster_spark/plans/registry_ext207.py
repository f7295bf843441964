"""Round-7 registry additions, batch 202 — partition-agreement measures
(how much label structure a hash partition retains — the evaluation
layer for any routing/sharding of embeddings):

Partition A = the `label` column; partition B = an 8-cell sign-LSH
code from THREE LITERAL ±1 hyperplanes (generated from the shared
affine hash at module import, so both engines fold the identical
constant vectors — dot products are exact integers on the ×1e6-scaled
coordinates).

- q_partition_agreement: homogeneity, completeness, and V-measure
  (Rosenberg & Hirschberg 2007) from the (bucket, label) contingency
  entropies — fixed-order folds, counts exact.
- q_adjusted_rand: the ARI — pair-counting agreement corrected for
  chance; every term is an exact integer C(n,2) sum until the final
  division.
- q_fowlkes_mallows: FM = TP/√((TP+FP)(TP+FN)) from the same exact
  pair counts.

At 100 TB: the bucket code is three expression-only integer dot
products per row (no UDF, no shuffle); the contingency is ≤ 8×|labels|
cells; everything downstream is cell-frame algebra.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb

_P = 2147483647
_PA_PLANES = 3
_EMB_D = 64
_SCALE = 1e6

# literal +-1 hyperplanes from the shared affine hash — identical
# constants compiled into BOTH engines' expressions
_SIGNS = [
    [
        1
        - 2
        * ((((b * _EMB_D + d) * 100003 + 7) * 2654435761 % _P) % 2)
        for d in range(_EMB_D)
    ]
    for b in range(_PA_PLANES)
]

_SQL_EINT = (
    f"list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
    f" * {_SCALE} + 0.5) AS BIGINT))"
)


def _sql_bucket() -> str:
    terms = []
    for b, signs in enumerate(_SIGNS):
        lit = "[" + ", ".join(str(s) for s in signs) + "]"
        terms.append(
            f"(CASE WHEN list_inner_product(v, {lit}) > 0"
            f" THEN {1 << b} ELSE 0 END)"
        )
    return " + ".join(terms)


def _bucket_col():
    out = F.lit(0)
    for b, signs in enumerate(_SIGNS):
        dot = F.aggregate(
            F.zip_with(
                F.col("v"),
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        out = out + F.when(dot > 0, 1 << b).otherwise(0)
    return out


_SQL_CELLS = f"""
    e AS (
      SELECT label, {_SQL_EINT} AS v FROM embeddings
    ),
    coded AS (SELECT label, {_sql_bucket()} AS bucket FROM e),
    cells AS (
      SELECT bucket, label, CAST(COUNT(*) AS BIGINT) AS nij
      FROM coded GROUP BY 1, 2
    ),
    arow AS (
      SELECT bucket, CAST(SUM(nij) AS BIGINT) AS a FROM cells GROUP BY 1
    ),
    bcol AS (
      SELECT label, CAST(SUM(nij) AS BIGINT) AS b FROM cells GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells)
"""


def _spark_cells(spark, sf_dir):
    e = _emb(spark, sf_dir).select(
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _SCALE + 0.5).cast(
                "long"
            ),
        ).alias("v"),
    )
    coded = e.select("label", _bucket_col().alias("bucket"))
    cells = coded.groupBy("bucket", "label").agg(
        F.count(F.lit(1)).alias("nij")
    )
    arow = cells.groupBy("bucket").agg(F.sum("nij").alias("a"))
    bcol = cells.groupBy("label").agg(F.sum("nij").alias("b"))
    tot = cells.agg(F.sum("nij").alias("n"))
    return cells, arow, bcol, tot


# ===========================================================================
# R602 — homogeneity / completeness / V-measure
# ===========================================================================

@register(
    "q_partition_agreement",
    f"""
    WITH {_SQL_CELLS},
    hl AS (
      SELECT -list_aggregate(
        list((CAST(b AS DOUBLE) / n) * ln(CAST(b AS DOUBLE) / n)
             ORDER BY label), 'sum') AS h_label
      FROM bcol CROSS JOIN tot GROUP BY n
    ),
    hb AS (
      SELECT -list_aggregate(
        list((CAST(a AS DOUBLE) / n) * ln(CAST(a AS DOUBLE) / n)
             ORDER BY bucket), 'sum') AS h_bucket
      FROM arow CROSS JOIN tot GROUP BY n
    ),
    hlb AS (
      SELECT -list_aggregate(
        list((CAST(nij AS DOUBLE) / n)
             * ln(CAST(nij AS DOUBLE) / a)
             ORDER BY bucket, label), 'sum') AS h_l_given_b
      FROM cells JOIN arow USING (bucket) CROSS JOIN tot GROUP BY n
    ),
    hbl AS (
      SELECT -list_aggregate(
        list((CAST(nij AS DOUBLE) / n)
             * ln(CAST(nij AS DOUBLE) / b)
             ORDER BY bucket, label), 'sum') AS h_b_given_l
      FROM cells JOIN bcol USING (label) CROSS JOIN tot GROUP BY n
    )
    SELECT round(1.0 - h_l_given_b / h_label, 6) AS homogeneity,
           round(1.0 - h_b_given_l / h_bucket, 6) AS completeness,
           round(2.0 * (1.0 - h_l_given_b / h_label)
                 * (1.0 - h_b_given_l / h_bucket)
                 / ((1.0 - h_l_given_b / h_label)
                    + (1.0 - h_b_given_l / h_bucket)), 6) AS v_measure
    FROM hl CROSS JOIN hb CROSS JOIN hlb CROSS JOIN hbl
    """,
)
def q_partition_agreement(spark, sf_dir):
    """R602 — homogeneity = 1 − H(L|B)/H(L), completeness = 1 −
    H(B|L)/H(B), V = their harmonic mean, from the ≤8×|labels|
    contingency.  Entropy sums run as fixed-order folds by cell key
    so both engines associate identically."""
    cells, arow, bcol, tot = _spark_cells(spark, sf_dir)

    def fold_entropy(df, keycols, expr):
        lst = F.transform(
            F.sort_array(
                F.collect_list(F.struct(*keycols, expr.alias("t")))
            ),
            lambda s: s.t,
        )
        return df.agg(
            (-F.aggregate(lst, F.lit(0.0), lambda a, x: a + x)).alias(
                "h"
            )
        )

    hl = fold_entropy(
        bcol.crossJoin(F.broadcast(tot)),
        ["label"],
        (F.col("b").cast("double") / F.col("n"))
        * F.log(F.col("b").cast("double") / F.col("n")),
    )
    hb = fold_entropy(
        arow.crossJoin(F.broadcast(tot)),
        ["bucket"],
        (F.col("a").cast("double") / F.col("n"))
        * F.log(F.col("a").cast("double") / F.col("n")),
    )
    hlb = fold_entropy(
        cells.join(F.broadcast(arow), "bucket").crossJoin(
            F.broadcast(tot)
        ),
        ["bucket", "label"],
        (F.col("nij").cast("double") / F.col("n"))
        * F.log(F.col("nij").cast("double") / F.col("a")),
    )
    hbl = fold_entropy(
        cells.join(F.broadcast(bcol), "label").crossJoin(
            F.broadcast(tot)
        ),
        ["bucket", "label"],
        (F.col("nij").cast("double") / F.col("n"))
        * F.log(F.col("nij").cast("double") / F.col("b")),
    )
    j = (
        hl.select(F.col("h").alias("h_label"))
        .crossJoin(hb.select(F.col("h").alias("h_bucket")))
        .crossJoin(hlb.select(F.col("h").alias("h_l_given_b")))
        .crossJoin(hbl.select(F.col("h").alias("h_b_given_l")))
    )
    hom = 1.0 - F.col("h_l_given_b") / F.col("h_label")
    com = 1.0 - F.col("h_b_given_l") / F.col("h_bucket")
    return j.select(
        F.round(hom, 6).alias("homogeneity"),
        F.round(com, 6).alias("completeness"),
        F.round(2.0 * hom * com / (hom + com), 6).alias("v_measure"),
    )


# ===========================================================================
# R603 — adjusted Rand index
# ===========================================================================

@register(
    "q_adjusted_rand",
    f"""
    WITH {_SQL_CELLS},
    sums AS (
      SELECT
        (SELECT CAST(SUM(nij * (nij - 1) / 2) AS BIGINT) FROM cells)
          AS sij,
        (SELECT CAST(SUM(a * (a - 1) / 2) AS BIGINT) FROM arow) AS sa,
        (SELECT CAST(SUM(b * (b - 1) / 2) AS BIGINT) FROM bcol) AS sb,
        (SELECT CAST(n * (n - 1) / 2 AS BIGINT) FROM tot) AS sn
    )
    SELECT sij, sa, sb, sn,
           round((sij - CAST(sa AS DOUBLE) * sb / sn)
                 / ((CAST(sa AS DOUBLE) + sb) / 2.0
                    - CAST(sa AS DOUBLE) * sb / sn), 6) AS ari
    FROM sums
    """,
)
def q_adjusted_rand(spark, sf_dir):
    """R603 — ARI = (Σ C(n_ij,2) − E) / (½[ΣC(a,2)+ΣC(b,2)] − E),
    E = ΣC(a,2)·ΣC(b,2)/C(n,2); every term an exact integer fold,
    one division at the end."""
    cells, arow, bcol, tot = _spark_cells(spark, sf_dir)
    sij = cells.agg(
        F.sum(F.col("nij") * (F.col("nij") - 1) / 2)
        .cast("long")
        .alias("sij")
    )
    sa = arow.agg(
        F.sum(F.col("a") * (F.col("a") - 1) / 2).cast("long").alias("sa")
    )
    sb = bcol.agg(
        F.sum(F.col("b") * (F.col("b") - 1) / 2).cast("long").alias("sb")
    )
    sn = tot.select(
        (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("sn")
    )
    j = (
        sij.crossJoin(F.broadcast(sa))
        .crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(sn))
    )
    e = F.col("sa").cast("double") * F.col("sb") / F.col("sn")
    return j.select(
        "sij",
        "sa",
        "sb",
        "sn",
        F.round(
            (F.col("sij") - e)
            / ((F.col("sa").cast("double") + F.col("sb")) / 2.0 - e),
            6,
        ).alias("ari"),
    )


# ===========================================================================
# R604 — Fowlkes-Mallows index
# ===========================================================================

@register(
    "q_fowlkes_mallows",
    f"""
    WITH {_SQL_CELLS},
    sums AS (
      SELECT
        (SELECT CAST(SUM(nij * (nij - 1) / 2) AS BIGINT) FROM cells)
          AS tp,
        (SELECT CAST(SUM(a * (a - 1) / 2) AS BIGINT) FROM arow)
          AS tp_fp,
        (SELECT CAST(SUM(b * (b - 1) / 2) AS BIGINT) FROM bcol)
          AS tp_fn
    )
    SELECT tp, tp_fp, tp_fn,
           round(tp / sqrt(CAST(tp_fp AS DOUBLE) * tp_fn), 6) AS fmi
    FROM sums
    """,
)
def q_fowlkes_mallows(spark, sf_dir):
    """R604 — FM = TP/√((TP+FP)(TP+FN)) over same-cell pair counts —
    the geometric-mean counterpart of ARI, exact integers until the
    final division."""
    cells, arow, bcol, _ = _spark_cells(spark, sf_dir)
    tp = cells.agg(
        F.sum(F.col("nij") * (F.col("nij") - 1) / 2)
        .cast("long")
        .alias("tp")
    )
    tp_fp = arow.agg(
        F.sum(F.col("a") * (F.col("a") - 1) / 2)
        .cast("long")
        .alias("tp_fp")
    )
    tp_fn = bcol.agg(
        F.sum(F.col("b") * (F.col("b") - 1) / 2)
        .cast("long")
        .alias("tp_fn")
    )
    return (
        tp.crossJoin(F.broadcast(tp_fp))
        .crossJoin(F.broadcast(tp_fn))
        .select(
            "tp",
            "tp_fp",
            "tp_fn",
            F.round(
                F.col("tp")
                / F.sqrt(
                    F.col("tp_fp").cast("double") * F.col("tp_fn")
                ),
                6,
            ).alias("fmi"),
        )
    )
