"""Round-9 registry additions, batch 232 — correlation-structure and
entropy-spectrum completions, SQL-backed:

- q_partial_corr: first-order partial correlation r(x,y|z) between
  per-user view and purchase counts controlling for total activity —
  the raw x–y correlation is mostly exposure; partialling out z shows
  what survives.  All three Pearson terms come from EXACT integer
  moment sums (counts), so the algebra is deterministic to the final
  square roots.
- q_renyi_entropy: the Rényi entropy spectrum (α = 0.5, 1, 2) of each
  source's token distribution — H₂ (collision entropy, exact rational
  Σm²/N²), Shannon (α→1 limit), and the tail-sensitive α=½; the
  spectrum's spread is a heavy-tail signature single-α entropies miss
  (q_char_entropy / q_user_entropy are the α=1 points of this curve).

At 100 TB: both are keyed integer aggs (user rollup / type spectrum)
plus scalar algebra; nothing pairwise, nothing iterative.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS, _docs
from arrow_supercluster_spark.sources.tables import read_events

# ===========================================================================
# R679 — first-order partial correlation
# ===========================================================================


@register(
    "q_partial_corr",
    """
    WITH u AS MATERIALIZED (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS z
      FROM events GROUP BY user_id
    ),
    m AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(z) AS BIGINT) AS sz,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(z * z) AS BIGINT) AS szz,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * z) AS BIGINT) AS sxz,
             CAST(SUM(y * z) AS BIGINT) AS syz
      FROM u
    ),
    r AS (
      SELECT n,
             (n * sxy - sx * sy) * 1.0
               / (sqrt(n * sxx - sx * sx * 1.0)
                  * sqrt(n * syy - sy * sy * 1.0)) AS rxy,
             (n * sxz - sx * sz) * 1.0
               / (sqrt(n * sxx - sx * sx * 1.0)
                  * sqrt(n * szz - sz * sz * 1.0)) AS rxz,
             (n * syz - sy * sz) * 1.0
               / (sqrt(n * syy - sy * sy * 1.0)
                  * sqrt(n * szz - sz * sz * 1.0)) AS ryz
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(rxy, 6) AS r_xy,
           round(rxz, 6) AS r_xz,
           round(ryz, 6) AS r_yz,
           round((rxy - rxz * ryz)
                 / (sqrt(1 - rxz * rxz) * sqrt(1 - ryz * ryz)), 6)
             AS r_xy_given_z
    FROM r
    """,
)
def q_partial_corr(spark, sf_dir):
    """R679 — first-order partial correlation r(views, purchases |
    total activity): r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)).
    The raw view↔purchase correlation is mostly shared exposure;
    conditioning on activity shows the residual association — the
    one-line confounder check before any engagement→revenue claim.
    Every moment is an EXACT int64 sum of counts (the n·Σxy − ΣxΣy
    form), so both engines hit identical doubles at the square roots.
    One user rollup + one 1-row agg."""
    ev = read_events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
        F.count(F.lit(1)).alias("z"),
    )
    m = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    )

    def pear(sab, sa, sb, saa, sbb):
        return (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)) * 1.0 / (
            F.sqrt(
                F.col("n") * F.col(saa) - F.col(sa) * F.col(sa) * 1.0
            )
            * F.sqrt(
                F.col("n") * F.col(sbb) - F.col(sb) * F.col(sb) * 1.0
            )
        )

    r = m.select(
        F.col("n"),
        pear("sxy", "sx", "sy", "sxx", "syy").alias("rxy"),
        pear("sxz", "sx", "sz", "sxx", "szz").alias("rxz"),
        pear("syz", "sy", "sz", "syy", "szz").alias("ryz"),
    )
    return r.select(
        F.col("n").cast("long").alias("n_users"),
        F.round("rxy", 6).alias("r_xy"),
        F.round("rxz", 6).alias("r_xz"),
        F.round("ryz", 6).alias("r_yz"),
        F.round(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / (
                F.sqrt(1 - F.col("rxz") * F.col("rxz"))
                * F.sqrt(1 - F.col("ryz") * F.col("ryz"))
            ),
            6,
        ).alias("r_xy_given_z"),
    )


# ===========================================================================
# R680 — Rényi entropy spectrum
# ===========================================================================


@register(
    "q_renyi_entropy",
    f"""
    WITH toks AS MATERIALIZED (
      SELECT source, g AS tok
      FROM (SELECT source, unnest({SQL_TOKS}) AS g FROM documents)
      WHERE g != ''
    ),
    freq AS MATERIALIZED (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS m
      FROM toks GROUP BY 1, 2
    ),
    sp AS (
      SELECT source,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(m * m) AS BIGINT) AS m2,
             SUM(sqrt(m * 1.0)) AS shalf,
             SUM(m * ln(m * 1.0)) AS slog
      FROM freq GROUP BY source
    )
    SELECT source, n AS n_tokens,
           round(2.0 * ln(shalf / sqrt(n * 1.0)), 6) AS h_half,
           round(ln(n * 1.0) - slog / n, 6) AS h_shannon,
           round(-ln(m2 * 1.0 / (n * 1.0 * n)), 6) AS h_collision
    FROM sp ORDER BY source
    """,
)
def q_renyi_entropy(spark, sf_dir):
    """R680 — Rényi entropy spectrum of each source's token
    distribution: H_α = ln(Σpᵅ)/(1−α) at α = ½ (tail-sensitive,
    2·ln(Σ√m/√N)), the Shannon limit (ln N − Σm·ln m / N), and α = 2
    (collision entropy, −ln(Σm²/N²) — exact integer numerator).
    H_½ ≥ H₁ ≥ H₂ always; the GAP between them is the heavy-tail
    signature a single entropy number hides (flat distributions
    collapse the spectrum to one value).  One spectrum agg per
    source."""
    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("m")
    )
    sp = freq.groupBy("source").agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("m2"),
        F.sum(F.sqrt(F.col("m") * 1.0)).alias("shalf"),
        F.sum(F.col("m") * F.log(F.col("m") * 1.0)).alias("slog"),
    )
    return sp.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.round(
            2.0 * F.log(F.col("shalf") / F.sqrt(F.col("n") * 1.0)), 6
        ).alias("h_half"),
        F.round(
            F.log(F.col("n") * 1.0) - F.col("slog") / F.col("n"), 6
        ).alias("h_shannon"),
        F.round(
            -F.log(F.col("m2") * 1.0 / (F.col("n") * 1.0 * F.col("n"))), 6
        ).alias("h_collision"),
    ).orderBy("source")
