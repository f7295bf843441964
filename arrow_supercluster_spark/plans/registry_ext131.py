"""Round-5 registry additions, batch 126 — search autocomplete, LSH
design, and reweighting diagnostics:

- q_autocomplete_index: prefix → top-k completion index over the
  corpus vocabulary (prefix lengths 1-3, completions ranked by corpus
  frequency) — the type-ahead index build as one explode + keyed
  top-k; at 100 TB the prefix key partitions the shuffle and the
  per-prefix window is bounded by the vocabulary under that prefix.
- q_lsh_planner: MinHash-LSH parameter DESIGN — for each (bands, rows)
  split of the signature budget, integrate the S-curve
  P(s) = 1 − (1 − s^r)^b to get false-positive mass below the target
  threshold and false-negative mass above it, and pick the split
  minimizing FP + FN. The a-priori companion to q_lsh_eval's
  empirical recall/precision and q_dedup_threshold_sweep: choose
  (b, r) BEFORE touching data. Pure literal-grid arithmetic — the
  integral is a 100-point sum of integer-scaled terms.
- q_effective_sample_size: Kish's effective sample size
  (Σw)²/Σw² + the design effect for the temperature-resampling
  weights (q_temperature_mix's α=0.7 source weights) — how many
  samples the reweighting is really worth. One keyed agg + closed
  form on integer-scaled weights.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs

_AC_PREFIX_MAX = 3
_AC_TOPK = 5
_LSH_SIG = 16  # signature length to split into bands x rows
_LSH_T = 0.6
_LSH_GRID = 100
_LSH_SCALE = 1_000_000_000
_ESS_ALPHA = 0.7
_ESS_SCALE = 1_000_000


# ===========================================================================
# R372 — autocomplete prefix index
# ===========================================================================

@register(
    "q_autocomplete_index",
    f"""
    WITH vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({SQL_TOKS}) AS tok FROM documents)
      WHERE tok != ''
      GROUP BY tok
    ),
    prefixed AS (
      SELECT substr(tok, 1, p.plen) AS prefix, tok, freq
      FROM vocab
      CROSS JOIN (SELECT unnest(range(1, {_AC_PREFIX_MAX} + 1)) AS plen) p
      WHERE length(tok) >= p.plen
    )
    SELECT prefix, tok AS completion, freq, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT prefix, tok, freq,
             ROW_NUMBER() OVER (PARTITION BY prefix
                                ORDER BY freq DESC, tok) AS rk
      FROM prefixed
    ) WHERE rk <= {_AC_TOPK}
    ORDER BY prefix, rk
    """,
)
def q_autocomplete_index(spark, sf_dir):
    """R372 — autocomplete index: corpus vocabulary → every prefix of
    length 1-{p} → top-{k} completions by corpus frequency (ties to
    the lexically smallest). One vocab agg + a ≤{p}× explode + a
    prefix-partitioned top-k (bounded by the per-prefix vocabulary) —
    the type-ahead artifact a search box serves. At 100 TB the vocab
    agg is the only full-corpus pass; everything after runs on the
    |vocab|-sized frame.""".format(p=_AC_PREFIX_MAX, k=_AC_TOPK)
    from pyspark.sql import Window

    from arrow_supercluster_spark.operators.dedup import tokenize

    vocab = (
        _docs(spark, sf_dir)
        .select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    prefixed = (
        vocab.select(
            "tok",
            "freq",
            F.explode(
                F.sequence(F.lit(1), F.lit(_AC_PREFIX_MAX))
            ).alias("plen"),
        )
        .filter(F.length("tok") >= F.col("plen"))
        .select(
            F.expr("substr(tok, 1, plen)").alias("prefix"), "tok", "freq"
        )
    )
    w = Window.partitionBy("prefix").orderBy(F.col("freq").desc(), "tok")
    return (
        prefixed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _AC_TOPK)
        .select(
            "prefix",
            F.col("tok").alias("completion"),
            "freq",
            F.col("rk").cast("long").alias("rk"),
        )
        .orderBy("prefix", "rk")
    )


# ===========================================================================
# R373 — LSH (bands × rows) parameter planner
# ===========================================================================

def _lsh_splits():
    return [
        (b, _LSH_SIG // b)
        for b in (1, 2, 4, 8, 16)
        if _LSH_SIG % b == 0
    ]


@register(
    "q_lsh_planner",
    f"""
    WITH grid AS (
      SELECT (k + 0.5) / {_LSH_GRID} AS s
      FROM (SELECT unnest(range(0, {_LSH_GRID})) AS k)
    ),
    splits AS (
      {' UNION ALL '.join(f'SELECT {b} AS bands, {r} AS rows_per_band'
                          for b, r in _lsh_splits())}
    ),
    curve AS (
      SELECT splits.bands, splits.rows_per_band, grid.s,
             1.0 - pow(1.0 - pow(grid.s, splits.rows_per_band),
                       splits.bands) AS p
      FROM splits CROSS JOIN grid
    ),
    masses AS (
      SELECT bands, rows_per_band,
             SUM(CASE WHEN s < {_LSH_T}
                      THEN CAST(round(p * {_LSH_SCALE}) AS BIGINT)
                      ELSE 0 END) AS fp_s,
             SUM(CASE WHEN s >= {_LSH_T}
                      THEN CAST(round((1.0 - p) * {_LSH_SCALE}) AS BIGINT)
                      ELSE 0 END) AS fn_s
      FROM curve GROUP BY bands, rows_per_band
    ),
    scored AS (
      SELECT bands, rows_per_band,
             round(fp_s * 1.0 / ({_LSH_SCALE} * 1.0 * {_LSH_GRID}), 6)
               AS fp_mass,
             round(fn_s * 1.0 / ({_LSH_SCALE} * 1.0 * {_LSH_GRID}), 6)
               AS fn_mass,
             fp_s + fn_s AS tot_s
      FROM masses
    )
    SELECT bands, rows_per_band, fp_mass, fn_mass,
           round(tot_s * 1.0 / ({_LSH_SCALE} * 1.0 * {_LSH_GRID}), 6)
             AS total_error,
           tot_s = (SELECT MIN(tot_s) FROM scored) AS recommended
    FROM scored
    ORDER BY bands
    """,
)
def q_lsh_planner(spark, sf_dir):
    """R373 — LSH parameter planner for a {sig}-hash MinHash signature
    at threshold t={t}: for every (bands b × rows r) factorization,
    integrate the collision S-curve 1 − (1 − s^r)^b on a {g}-point
    midpoint grid — mass below t is false-positive work, missing mass
    above t is false-negative loss — and flag the argmin split. The
    integral terms are integer-scaled (engine-stable comparison on
    exact BIGINTs), the whole query touches no data at all (design
    precedes the corpus), and the recommendation is what
    q_dedup_minhash's (b, r) should be set to at this threshold. The
    planning member of the LSH family (eval: q_lsh_eval; sweep:
    q_dedup_threshold_sweep).""".format(
        sig=_LSH_SIG, t=_LSH_T, g=_LSH_GRID
    )
    splits = spark.createDataFrame(
        _lsh_splits(), "bands int, rows_per_band int"
    )
    grid = spark.range(_LSH_GRID).select(
        ((F.col("id") + 0.5) / _LSH_GRID).alias("s")
    )
    curve = splits.crossJoin(grid).select(
        "bands",
        "rows_per_band",
        "s",
        (
            1.0
            - F.pow(
                1.0 - F.pow(F.col("s"), F.col("rows_per_band")),
                F.col("bands"),
            )
        ).alias("p"),
    )
    masses = curve.groupBy("bands", "rows_per_band").agg(
        F.sum(
            F.when(
                F.col("s") < _LSH_T,
                F.round(F.col("p") * _LSH_SCALE).cast("long"),
            ).otherwise(0)
        ).alias("fp_s"),
        F.sum(
            F.when(
                F.col("s") >= _LSH_T,
                F.round((1.0 - F.col("p")) * _LSH_SCALE).cast("long"),
            ).otherwise(0)
        ).alias("fn_s"),
    )
    scored = masses.select(
        "bands",
        "rows_per_band",
        F.round(
            F.col("fp_s") * 1.0 / (_LSH_SCALE * 1.0 * _LSH_GRID), 6
        ).alias("fp_mass"),
        F.round(
            F.col("fn_s") * 1.0 / (_LSH_SCALE * 1.0 * _LSH_GRID), 6
        ).alias("fn_mass"),
        (F.col("fp_s") + F.col("fn_s")).alias("tot_s"),
    )
    best = scored.agg(F.min("tot_s").alias("best_s"))
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "bands",
            "rows_per_band",
            "fp_mass",
            "fn_mass",
            F.round(
                F.col("tot_s") * 1.0 / (_LSH_SCALE * 1.0 * _LSH_GRID), 6
            ).alias("total_error"),
            (F.col("tot_s") == F.col("best_s")).alias("recommended"),
        )
        .orderBy("bands")
    )


# ===========================================================================
# R374 — Kish effective sample size
# ===========================================================================

@register(
    "q_effective_sample_size",
    f"""
    WITH src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n) AS total FROM src),
    weighted AS (
      SELECT src.source, src.n,
             pow(src.n * 1.0 / tot.total, {_ESS_ALPHA})
               / (src.n * 1.0 / tot.total) AS w
      FROM src CROSS JOIN tot
    ),
    rows_w AS (
      -- w and w² are scaled SEPARATELY (squaring a scaled int would
      -- overflow int64 long before the weights get interesting)
      SELECT CAST(round(w * {_ESS_SCALE}) AS BIGINT) AS wi,
             CAST(round(w * w * {_ESS_SCALE}) AS BIGINT) AS wi2, n
      FROM weighted
    ),
    sums AS (
      SELECT SUM(wi * n) AS s1,
             SUM(wi2 * n) AS s2,
             SUM(n) AS total
      FROM rows_w
    )
    SELECT CAST(total AS BIGINT) AS n_rows,
           round(s1 * 1.0 * s1 / (s2 * 1.0 * {_ESS_SCALE}), 4) AS ess,
           round(total * s2 * 1.0 * {_ESS_SCALE} / (s1 * 1.0 * s1), 6)
             AS design_effect,
           round(s1 * 1.0 * s1 / (s2 * 1.0 * {_ESS_SCALE}) / total, 6)
             AS ess_fraction
    FROM sums
    """,
)
def q_effective_sample_size(spark, sf_dir):
    """R374 — Kish effective sample size of the temperature-resampling
    weights (each doc carries w ∝ p^α/p for its source share, α={a} —
    the q_temperature_mix reweighting): ESS = (Σw)²/Σw², design effect
    = n·Σw²/(Σw)². Per-row weights are constant within a source, so
    the sums assemble from the |sources|-row table with integer-scaled
    weights — exact at any corpus size. ESS is the honest sample count
    a reweighted estimate deserves; a design effect ≫ 1 says the mix
    bought distribution shape with statistical power.""".format(
        a=_ESS_ALPHA
    )
    src = _docs(spark, sf_dir).groupBy("source").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = src.agg(F.sum("n").alias("total"))
    weighted = src.crossJoin(F.broadcast(tot)).select(
        "n",
        (
            F.pow(F.col("n") * 1.0 / F.col("total"), _ESS_ALPHA)
            / (F.col("n") * 1.0 / F.col("total"))
        ).alias("w"),
    )
    rows_w = weighted.select(
        F.round(F.col("w") * _ESS_SCALE).cast("long").alias("wi"),
        F.round(F.col("w") * F.col("w") * _ESS_SCALE)
        .cast("long")
        .alias("wi2"),
        "n",
    )
    sums = rows_w.agg(
        F.sum(F.col("wi") * F.col("n")).alias("s1"),
        F.sum(F.col("wi2") * F.col("n")).alias("s2"),
        F.sum("n").alias("total"),
    )
    return sums.select(
        F.col("total").cast("long").alias("n_rows"),
        F.round(
            F.col("s1") * 1.0 * F.col("s1")
            / (F.col("s2") * 1.0 * _ESS_SCALE),
            4,
        ).alias("ess"),
        F.round(
            F.col("total")
            * F.col("s2")
            * 1.0
            * _ESS_SCALE
            / (F.col("s1") * 1.0 * F.col("s1")),
            6,
        ).alias("design_effect"),
        F.round(
            F.col("s1")
            * 1.0
            * F.col("s1")
            / (F.col("s2") * 1.0 * _ESS_SCALE)
            / F.col("total"),
            6,
        ).alias("ess_fraction"),
    )
