"""Round-5 registry additions, batch 122 — distribution distance,
experiment sizing, and embedding drift:

- q_wasserstein_1d: exact 1-D Wasserstein-1 (earth-mover) distance
  between the click and purchase value distributions — W₁ =
  ∫|F_A − F_B| dx over the merged support, assembled ENTIRELY in
  integers: cumulative counts from distrank over the distinct-cents
  frame, the integrand |cumA·n_B − cumB·n_A|·Δx on the common
  denominator n_A·n_B. The metric that sees mean/shape shifts KS
  (max-gap) and PSI (binned) blur.
- q_ab_power: the experiment-sizing calculator — n per arm =
  2σ²(z_{{1−α/2}} + z_{{1−β}})²/δ² for detecting a 5%-of-mean lift at
  α=0.05, power=0.8 (z's are literals), with the is-the-current-corpus
  -big-enough verdict. The query every A/B test should run BEFORE
  q_ab_test.
- q_embedding_drift: reference-vs-current embedding drift (split by
  vec_id parity): per-dimension Welch z on the mean shift (top-8 by
  |z|) + the overall centroid L2 distance from integer-scaled
  per-dim terms. The monitoring companion to q_psi_drift for vector
  features.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.functions import distrank
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb

_PW_Z_ALPHA = 1.959964  # z_{0.975}
_PW_Z_BETA = 0.841621  # z_{0.8}
_DRIFT_TOP = 8
_DRIFT_SCALE = 1_000_000


# ===========================================================================
# R360 — exact 1-D Wasserstein distance
# ===========================================================================

@register(
    "q_wasserstein_1d",
    """
    WITH vals AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    counts AS (
      SELECT c,
             CAST(SUM(is_a) AS BIGINT) AS ca,
             CAST(SUM(1 - is_a) AS BIGINT) AS cb
      FROM vals GROUP BY c
    ),
    tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM counts),
    scanned AS (
      SELECT c,
             SUM(ca) OVER (ORDER BY c
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cuma,
             SUM(cb) OVER (ORDER BY c
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cumb,
             lead(c) OVER (ORDER BY c) AS cnext
      FROM counts
    ),
    integrand AS (
      SELECT abs(scanned.cuma * tot.nb - scanned.cumb * tot.na)
               * (scanned.cnext - scanned.c) AS term
      FROM scanned CROSS JOIN tot
      WHERE scanned.cnext IS NOT NULL
    )
    SELECT CAST(tot.na AS BIGINT) AS n_a, CAST(tot.nb AS BIGINT) AS n_b,
           round(SUM(integrand.term) * 1.0
                 / (tot.na * tot.nb * 100.0), 6) AS w1_distance
    FROM integrand CROSS JOIN tot
    GROUP BY tot.na, tot.nb
    """,
)
def q_wasserstein_1d(spark, sf_dir):
    """R360 — exact 1-D earth-mover distance between the click and
    purchase value distributions: over the distinct-cents support,
    W₁ = Σ |F_A − F_B|·Δx with the CDF gap kept on the integer common
    denominator n_A·n_B (|cumA·n_B − cumB·n_A|·Δc — every term and the
    sum are exact BIGINTs; one final division scales to dollars). The
    cumulative counts come from distrank.zip_scan over the DISTINCT
    value frame (|support| ≪ |rows|; no unpartitioned window — the
    oracle's window is the semantic twin), consecutive-value gaps from
    a rank self-join. Complements q_ks_test (max gap) and q_psi_drift
    (binned) with the integrated-transport metric."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type").isin("click", "purchase")
    )
    counts = (
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("c"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("is_a"),
        )
        .groupBy("c")
        .agg(
            F.sum("is_a").alias("ca"),
            F.sum(1 - F.col("is_a")).alias("cb"),
        )
    )
    scanned, _, totals = distrank.zip_scan(
        counts,
        ["c"],
        out="idx",
        scan_col=["ca", "cb"],
        scan_out=["cuma", "cumb"],
    )
    na, nb = int(totals[0]), int(totals[1])
    cur = scanned.select(
        "idx",
        "c",
        F.col("cuma").cast("long").alias("cuma"),
        F.col("cumb").cast("long").alias("cumb"),
    )
    nxt = scanned.select(
        (F.col("idx") - 1).alias("idx"), F.col("c").alias("cnext")
    )
    integrand = cur.join(nxt, "idx").select(
        (
            F.abs(
                F.col("cuma") * F.lit(nb) - F.col("cumb") * F.lit(na)
            )
            * (F.col("cnext") - F.col("c"))
        ).alias("term")
    )
    return integrand.agg(
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.round(
            F.sum("term") * 1.0 / (na * nb * 100.0), 6
        ).alias("w1_distance"),
    )


# ===========================================================================
# R361 — A/B test power / sample-size calculator
# ===========================================================================

@register(
    "q_ab_power",
    f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(round(value * 100) AS BIGINT)) AS sc,
             SUM(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS ssq
      FROM events WHERE event_type = 'click'
    ),
    s AS (
      SELECT n,
             sc / (100.0 * n) AS mean_v,
             sqrt((ssq - sc * sc * 1.0 / n) / (10000.0 * (n - 1))) AS sigma
      FROM m
    )
    SELECT n AS n_current,
           round(mean_v, 4) AS mean_v,
           round(sigma, 4) AS sigma,
           round(0.05 * mean_v, 4) AS delta,
           CAST(ceil(2.0 * sigma * sigma
                     * ({_PW_Z_ALPHA} + {_PW_Z_BETA})
                     * ({_PW_Z_ALPHA} + {_PW_Z_BETA})
                     / (0.05 * mean_v * 0.05 * mean_v)) AS BIGINT)
             AS n_per_arm,
           (n >= 2 * ceil(2.0 * sigma * sigma
                     * ({_PW_Z_ALPHA} + {_PW_Z_BETA})
                     * ({_PW_Z_ALPHA} + {_PW_Z_BETA})
                     / (0.05 * mean_v * 0.05 * mean_v))) AS adequately_powered
    FROM s
    """,
)
def q_ab_power(spark, sf_dir):
    """R361 — two-sample power calculation on the click-value metric:
    n per arm = 2σ²(z₀.₉₇₅ + z₀.₈)²/δ² for a minimum detectable effect
    of 5% of the mean (z's are Python-evaluated literals — no inverse
    normal in either engine), σ from exact integer-cent moments, plus
    the verdict on whether the current corpus could even host the
    test. One agg + closed form — the query to run BEFORE q_ab_test,
    at any scale."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("event_type") == "click"
    )
    cents = F.round(F.col("value") * 100).cast("long")
    m = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sc"),
        F.sum(cents * cents).alias("ssq"),
    )
    mean_v = F.col("sc") / (100.0 * F.col("n"))
    sigma = F.sqrt(
        (F.col("ssq") - F.col("sc") * F.col("sc") * 1.0 / F.col("n"))
        / (10000.0 * (F.col("n") - 1))
    )
    zsum = _PW_Z_ALPHA + _PW_Z_BETA
    n_arm = F.ceil(
        2.0 * sigma * sigma * zsum * zsum
        / (0.05 * mean_v * 0.05 * mean_v)
    )
    return m.select(
        F.col("n").alias("n_current"),
        F.round(mean_v, 4).alias("mean_v"),
        F.round(sigma, 4).alias("sigma"),
        F.round(0.05 * mean_v, 4).alias("delta"),
        n_arm.cast("long").alias("n_per_arm"),
        (F.col("n") >= 2 * n_arm).alias("adequately_powered"),
    )


# ===========================================================================
# R362 — embedding drift report
# ===========================================================================

@register(
    "q_embedding_drift",
    f"""
    WITH comp AS (
      SELECT vec_id % 2 AS grp, pos, CAST(v AS DOUBLE) AS v
      FROM (
        SELECT vec_id, unnest(embedding) AS v,
               unnest(generate_series(0, len(embedding) - 1)) AS pos
        FROM embeddings
      ) t
    ),
    stats AS (
      SELECT pos, grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             round(AVG(v), 6) AS mu,
             round(stddev_samp(v), 6) AS sd
      FROM comp GROUP BY pos, grp
    ),
    wide AS (
      SELECT a.pos,
             a.n AS n0, a.mu AS mu0, a.sd AS sd0,
             b.n AS n1, b.mu AS mu1, b.sd AS sd1
      FROM stats a JOIN stats b ON a.pos = b.pos
      WHERE a.grp = 0 AND b.grp = 1
    ),
    z AS (
      SELECT pos, mu0, mu1,
             (mu1 - mu0) / sqrt(sd0 * sd0 / n0 + sd1 * sd1 / n1) AS drift_z,
             CAST(round((mu1 - mu0) * (mu1 - mu0) * {_DRIFT_SCALE})
                  AS BIGINT) AS sq_scaled
      FROM wide
    ),
    l2 AS (
      SELECT round(sqrt(SUM(sq_scaled) * 1.0 / {_DRIFT_SCALE}), 6)
               AS centroid_l2
      FROM z
    )
    SELECT z.pos, round(z.mu0, 6) AS mu_ref, round(z.mu1, 6) AS mu_cur,
           round(z.drift_z, 4) AS drift_z, l2.centroid_l2
    FROM z CROSS JOIN l2
    ORDER BY abs(round(z.drift_z, 4)) DESC, z.pos
    LIMIT {_DRIFT_TOP}
    """,
)
def q_embedding_drift(spark, sf_dir):
    """R362 — embedding drift report, reference (even vec_id) vs
    current (odd): per-dimension Welch z on the mean shift, ranked by
    |z| (rounded, so the top-{t} cut is engine-stable), stapled to the
    overall centroid L2 distance — whose squared terms are
    integer-scaled before summing across the {t}-row dimension frame
    (cross-dimension double sums would be association-ordered). The
    vector-feature sibling of q_psi_drift; at 100 TB this is one
    posexplode + a dimension-keyed agg.""".format(t=_DRIFT_TOP)
    comp = _emb(spark, sf_dir).select(
        (F.col("vec_id") % 2).alias("grp"),
        F.posexplode("embedding").alias("pos", "v"),
    ).select("grp", "pos", F.col("v").cast("double").alias("v"))
    stats = comp.groupBy("pos", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v"), 6).alias("mu"),
        F.round(F.stddev_samp("v"), 6).alias("sd"),
    )
    a = stats.filter(F.col("grp") == 0).select(
        "pos",
        F.col("n").alias("n0"),
        F.col("mu").alias("mu0"),
        F.col("sd").alias("sd0"),
    )
    b = stats.filter(F.col("grp") == 1).select(
        "pos",
        F.col("n").alias("n1"),
        F.col("mu").alias("mu1"),
        F.col("sd").alias("sd1"),
    )
    z = a.join(b, "pos").select(
        "pos",
        "mu0",
        "mu1",
        (
            (F.col("mu1") - F.col("mu0"))
            / F.sqrt(
                F.col("sd0") * F.col("sd0") / F.col("n0")
                + F.col("sd1") * F.col("sd1") / F.col("n1")
            )
        ).alias("drift_z"),
        F.round(
            (F.col("mu1") - F.col("mu0"))
            * (F.col("mu1") - F.col("mu0"))
            * _DRIFT_SCALE
        )
        .cast("long")
        .alias("sq_scaled"),
    )
    l2 = z.agg(
        F.round(
            F.sqrt(F.sum("sq_scaled") * 1.0 / _DRIFT_SCALE), 6
        ).alias("centroid_l2")
    )
    return (
        z.crossJoin(F.broadcast(l2))
        .select(
            "pos",
            F.round("mu0", 6).alias("mu_ref"),
            F.round("mu1", 6).alias("mu_cur"),
            F.round("drift_z", 4).alias("drift_z"),
            "centroid_l2",
        )
        .orderBy(F.abs(F.col("drift_z")).desc(), "pos")
        .limit(_DRIFT_TOP)
    )
