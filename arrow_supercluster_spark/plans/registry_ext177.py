"""Round-7 registry additions, batch 172 — experimentation and
replication systems operators:

- q_bandit_probability: P(variant B beats A) for the purchase-rate
  metric under the normal posterior approximation — the
  Thompson-sampling readout an experimentation platform prints next
  to q_ab_test's p-value. Φ comes from the Zelen-Severo (A&S
  26.2.17) polynomial as identical arithmetic in both engines (the
  same discipline as the BSM probit in registry_ext173).
- q_incremental_join: delta maintenance of a join view — maintained =
  base(orders≤cutoff ⋈ customer) ∪ Δorders ⋈ customer, checked equal
  to the full recompute (ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB with a static dim
  collapses to ΔA⋈B — the incremental-view-maintenance identity as a
  checkable query; q_incremental_agg is the aggregate sibling).
- q_table_checksum: order-insensitive key-set checksums for five
  warehouse tables — Σ over rows of a portable polynomial hash of the
  key, plus the count. The replica-validation primitive: equal
  checksums+counts ⇔ equal key multisets (mod the stated 2^31 space),
  without moving any rows.

At 100 TB: the bandit readout is one conditional agg; incremental
maintenance touches ONLY the delta partition plus the broadcast dim;
checksums are per-table 1-row aggs with map-side partial sums.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

# Zelen-Severo Φ approximation constants (Abramowitz & Stegun 26.2.17).
_ZS_P = 0.2316419
_ZS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978,
         1.330274429)
_IJ_CUTOFF = "1999-01-01"
_CK_TABLES = (
    ("customer", "c_custkey"),
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey * 8 + l_linenumber"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
)
_CK_MOD = 2147483647


def zs_phi_sql(x: str) -> str:
    """Φ({x}) via Zelen-Severo, as a DuckDB expression (|err| < 7.5e-8)."""
    ax = f"abs({x})"
    t = f"(1.0 / (1.0 + {_ZS_P} * {ax}))"
    b1, b2, b3, b4, b5 = _ZS_B
    poly = (
        f"((((({b5} * {t} + {b4}) * {t} + {b3}) * {t} + {b2}) * {t}"
        f" + {b1}) * {t})"
    )
    pdf = f"(exp(-({ax} * {ax}) / 2.0) / sqrt(2.0 * pi()))"
    upper = f"(1.0 - {pdf} * {poly})"
    return f"CASE WHEN {x} >= 0 THEN {upper} ELSE 1.0 - {upper} END"


def zs_phi_col(x):
    """Φ(x) as a Spark Column — same arithmetic as zs_phi_sql."""
    import math

    ax = F.abs(x)
    t = 1.0 / (1.0 + _ZS_P * ax)
    b1, b2, b3, b4, b5 = _ZS_B
    poly = ((((b5 * t + b4) * t + b3) * t + b2) * t + b1) * t
    pdf = F.exp(-(ax * ax) / 2.0) / math.sqrt(2.0 * math.pi)
    upper = 1.0 - pdf * poly
    return F.when(x >= 0, upper).otherwise(1.0 - upper)


# ===========================================================================
# R513 — bandit beats-probability readout
# ===========================================================================

@register(
    "q_bandit_probability",
    f"""
    WITH arms AS (
      SELECT user_id % 2 AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value > 90
                 THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ),
    stats AS (
      SELECT
        SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) * 1.0
          / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS pa,
        SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) * 1.0
          / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS pb,
        (SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) + 1.0)
          / (SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) + 2.0) AS pat,
        (SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) + 1.0)
          / (SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) + 2.0) AS pbt,
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb
      FROM arms
    ),
    z AS (
      SELECT pa, pb, na, nb,
             (pb - pa)
               / sqrt(pat * (1 - pat) / na + pbt * (1 - pbt) / nb)
               AS zscore
      FROM stats
    )
    SELECT round(pa, 6) AS rate_a, round(pb, 6) AS rate_b,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(zscore, 6) AS z,
           round({zs_phi_sql('zscore')}, 6) AS p_b_beats_a
    FROM z
    """,
)
def q_bandit_probability(spark, sf_dir):
    """R513 — P(variant B beats A) on per-user conversion (arm =
    user_id mod 2, the q_ab_test split): under independent normal
    posteriors, P(B>A) = Φ((p̂_b − p̂_a)/√(σ̃²_a + σ̃²_b)) with the
    Agresti-Coull-smoothed variance terms ((x+1)/(n+2)) so a fully
    converting arm cannot zero the denominator (stated) — the
    Thompson-sampling allocation signal, read alongside q_ab_test's
    frequentist z. Φ is the Zelen-Severo polynomial evaluated with
    the identical constants in both engines (|err| < 7.5e-8 ≪ the
    6-digit round). One user groupBy + one 1-row conditional agg."""
    ev = read_events(spark, sf_dir)
    arms = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 90),
                1,
            ).otherwise(0)
        ).alias("converted"),
    ).select((F.col("user_id") % 2).alias("arm"), "converted")
    s = arms.agg(
        (
            F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
            * 1.0
            / F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        ).alias("pa"),
        (
            F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
            * 1.0
            / F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        ).alias("pb"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb"),
    )
    pa, pb = F.col("pa"), F.col("pb")
    # Agresti-Coull-smoothed variance term: (x+1)/(n+2) keeps the
    # denominator strictly positive even when an arm fully converts —
    # the same stated smoothing in both engines; reported rates stay raw
    pat = (pa * F.col("na") + 1.0) / (F.col("na") + 2.0)
    pbt = (pb * F.col("nb") + 1.0) / (F.col("nb") + 2.0)
    z = (pb - pa) / F.sqrt(
        pat * (1 - pat) / F.col("na") + pbt * (1 - pbt) / F.col("nb")
    )
    return s.select(
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(z, 6).alias("z"),
        F.round(zs_phi_col(z), 6).alias("p_b_beats_a"),
    )


# ===========================================================================
# R514 — incremental join-view maintenance
# ===========================================================================

@register(
    "q_incremental_join",
    f"""
    WITH base AS (
      SELECT o.o_orderkey, c.c_mktsegment
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderdate < TIMESTAMP '{_IJ_CUTOFF} 00:00:00'
    ),
    delta AS (
      SELECT o.o_orderkey, c.c_mktsegment
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderdate >= TIMESTAMP '{_IJ_CUTOFF} 00:00:00'
    ),
    maintained AS (
      SELECT * FROM base UNION ALL SELECT * FROM delta
    ),
    full_r AS (
      SELECT o.o_orderkey, c.c_mktsegment
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    m AS (
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_maint
      FROM maintained GROUP BY 1
    ),
    f AS (
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_full
      FROM full_r GROUP BY 1
    )
    SELECT m.c_mktsegment, m.n_maint, f.n_full,
           m.n_maint = f.n_full AS consistent
    FROM m JOIN f ON m.c_mktsegment = f.c_mktsegment
    ORDER BY m.c_mktsegment
    """,
)
def q_incremental_join(spark, sf_dir):
    """R514 — incremental maintenance of a join view: the base view
    (orders before {d} ⋈ customer) is refreshed by joining ONLY the
    delta partition (orders ≥ {d}) against the static dimension —
    the ΔA⋈B term; A⋈ΔB and ΔA⋈ΔB vanish when B is unchanged. The
    output compares the maintained per-segment counts against the
    full recompute and ships the equality as `consistent` — the IVM
    identity as a driver-checkable query (q_incremental_agg is the
    aggregate sibling). At 100 TB the refresh cost is |Δ| rows ⋈ a
    broadcast dim, not the re-join of history — THE point of
    incremental view maintenance.""".format(d=_IJ_CUTOFF)

    def _t(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    o = _t("orders")
    c = _t("customer").select("c_custkey", "c_mktsegment")
    cut = F.lit(_IJ_CUTOFF).cast("timestamp")
    base = (
        o.filter(F.col("o_orderdate") < cut)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_mktsegment")
    )
    delta = (
        o.filter(F.col("o_orderdate") >= cut)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_mktsegment")
    )
    maintained = base.unionByName(delta)
    full_r = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    m = maintained.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_maint")
    )
    f = full_r.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_full")
    )
    return (
        m.join(f, "c_mktsegment")
        .select(
            "c_mktsegment", "n_maint", "n_full",
            (F.col("n_maint") == F.col("n_full")).alias("consistent"),
        )
        .orderBy("c_mktsegment")
    )


# ===========================================================================
# R515 — order-insensitive table checksums
# ===========================================================================

_CK_SQL = " UNION ALL ".join(
    f"""
    SELECT '{t}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM((({expr}) * 2654435761 + 17) % {_CK_MOD}) AS BIGINT)
             AS key_checksum
    FROM {t}
    """
    for t, expr in _CK_TABLES
)


@register("q_table_checksum", _CK_SQL + " ORDER BY tbl")
def q_table_checksum(spark, sf_dir):
    """R515 — order-insensitive key-set checksums for five warehouse
    tables: Σ over rows of a portable polynomial hash of the stated
    key expression (mod {m}), plus the row count. Replica validation
    without moving rows: equal (count, checksum) pairs certify equal
    key multisets up to the hash space — the cross-cluster
    consistency check every replication pipeline runs nightly. Pure
    integer arithmetic, map-side partial sums, 5 output rows.""".format(
        m=_CK_MOD
    )

    def _t(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    outs = []
    for t, expr in _CK_TABLES:
        df = _t(t)
        key = F.expr(expr)
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum((key * 2654435761 + 17) % _CK_MOD)
                .cast("long").alias("key_checksum"),
            ).select(F.lit(t).alias("tbl"), "n_rows", "key_checksum")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("tbl")
