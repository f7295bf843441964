"""Round-9 registry additions, batch 228 — warehouse + evaluation
completions, all SQL-backed:

- q_tpch_q6: the canonical selective-aggregate forecast query (the last
  unclaimed classic TPC-H shape expressible on these tables) — three
  pushed predicates into one scan, one 1-row agg, exact integer revenue.
- q_gamma_assoc: Goodman-Kruskal gamma between two ORDINALS (order
  priority rank × price band) — concordance over the bounded
  contingency table, never row pairs.
- q_ewma_control: EWMA control chart over daily event counts — the
  closed-form power-weighted scan (q_ema_daily's algebra) plus the
  time-varying 3σ limits and breach flags; the monitoring twin of
  q_cusum_changepoint.
- q_cindex: survival concordance index (Harrell's C) of an integer-cents
  risk score against event-to-churn durations — all arithmetic exact
  (cents, seconds), pairs bounded by the user dimension.
- q_granger_lite: lag-1 Granger-style F test — does yesterday's view
  count improve today's purchase-count prediction beyond yesterday's
  purchases?  Closed-form 2-predictor OLS via centered 2×2 normal
  equations; single-row output.
- q_random_projection: Johnson-Lindenstrauss ±1 projection 64→16 dims
  with a PINNED integer sign matrix (pure arithmetic — identical in
  both engines); reports distance-preservation ratio stats over
  adjacent embedding pairs (E[ratio] = 1 by the JL identity
  E‖Rx‖² = d'·‖x‖²).

At 100 TB: q6 is one pushed-predicate scan; gamma's concordance runs on
a ≤5×6 contingency; the EWMA/Granger series are calendar-bounded; the
c-index pairs the USER DIMENSION against itself (cap by deterministic
hash-sample when users outgrow a broadcast — stated); the projection is
a narrow per-row map.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _emb
from arrow_supercluster_spark.sources.tables import read_events, read_table

# ===========================================================================
# R659 — TPC-H Q6 forecast-revenue-change
# ===========================================================================

_Q6_START, _Q6_END = "1996-01-01", "1997-01-01"
_Q6_LO, _Q6_HI, _Q6_QTY = 0.05, 0.07, 24


@register(
    "q_tpch_q6",
    f"""
    SELECT round(SUM(CAST(round(l_extendedprice * l_discount * 10000)
                          AS BIGINT)) / 10000.0, 4) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_START} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{_Q6_END} 00:00:00'
      AND l_discount BETWEEN {_Q6_LO} AND {_Q6_HI}
      AND l_quantity < {_Q6_QTY}
    """,
)
def q_tpch_q6(spark, sf_dir):
    """R659 — TPC-H Q6: revenue increase from hypothetically dropping
    small-quantity discounts — SUM(extendedprice·discount) under a
    year + discount-band + quantity predicate.  The canonical
    pushdown showcase: all three predicates reach the parquet scan
    (PushedFilters), the agg is 1 row, no shuffle beyond the partial
    agg.  Integer micro-units (price·discount·10⁴) keep the sum exact
    cross-engine."""
    li = read_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit(_Q6_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q6_END).cast("timestamp"))
        & (F.col("l_discount") >= _Q6_LO)
        & (F.col("l_discount") <= _Q6_HI)
        & (F.col("l_quantity") < _Q6_QTY)
    )
    unit = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 10000
    ).cast("long")
    return f.agg(
        F.round(F.sum(unit) / 10000.0, 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ===========================================================================
# R660 — Goodman-Kruskal gamma (ordinal association)
# ===========================================================================

_GA_BAND = 50_000.0
_GA_BAND_CAP = 5


@register(
    "q_gamma_assoc",
    f"""
    WITH cells AS MATERIALIZED (
      SELECT CAST(string_split(o_orderpriority, '-')[1] AS BIGINT) AS px,
             LEAST(CAST(FLOOR(o_totalprice / {_GA_BAND}) AS BIGINT),
                   {_GA_BAND_CAP}) AS band,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ),
    cd AS (
      SELECT
        SUM(CASE WHEN a.px < b.px AND a.band < b.band
                 THEN a.n * b.n ELSE 0 END) AS c,
        SUM(CASE WHEN a.px < b.px AND a.band > b.band
                 THEN a.n * b.n ELSE 0 END) AS d
      FROM cells a CROSS JOIN cells b
    )
    SELECT CAST(c AS BIGINT) AS concordant, CAST(d AS BIGINT) AS discordant,
           round((c - d) * 1.0 / (c + d), 6) AS gamma
    FROM cd
    """,
)
def q_gamma_assoc(spark, sf_dir):
    """R660 — Goodman-Kruskal γ between order-priority rank (the
    leading digit of o_orderpriority) and price band
    (⌊totalprice/50k⌋ capped at {cap}): γ = (C−D)/(C+D) over
    concordant/discordant pairs.  Computed on the ≤5×{cap1} CONTINGENCY
    table (cell-count products), never on row pairs — the O(cells²)
    identity that makes ordinal association free at any corpus size.
    All-integer until the final ratio.""".format(
        cap=_GA_BAND_CAP, cap1=_GA_BAND_CAP + 1
    )
    o = read_table(spark, sf_dir, "orders")
    cells = (
        o.select(
            F.split("o_orderpriority", "-").getItem(0).cast("long").alias("px"),
            F.least(
                F.floor(F.col("o_totalprice") / _GA_BAND).cast("long"),
                F.lit(_GA_BAND_CAP).cast("long"),
            ).alias("band"),
        )
        .groupBy("px", "band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = cells.select(
        F.col("px").alias("apx"), F.col("band").alias("aband"),
        F.col("n").alias("an"),
    )
    b = cells.select(
        F.col("px").alias("bpx"), F.col("band").alias("bband"),
        F.col("n").alias("bn"),
    )
    cd = a.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.when(
                (F.col("apx") < F.col("bpx"))
                & (F.col("aband") < F.col("bband")),
                F.col("an") * F.col("bn"),
            ).otherwise(0)
        ).alias("c"),
        F.sum(
            F.when(
                (F.col("apx") < F.col("bpx"))
                & (F.col("aband") > F.col("bband")),
                F.col("an") * F.col("bn"),
            ).otherwise(0)
        ).alias("d"),
    )
    return cd.select(
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d")) * 1.0 / (F.col("c") + F.col("d")), 6
        ).alias("gamma"),
    )


# ===========================================================================
# R661 — EWMA control chart
# ===========================================================================

_EWMA_LAMBDA = 0.2


@register(
    "q_ewma_control",
    f"""
    WITH daily AS MATERIALIZED (
      SELECT date_trunc('day', ts) AS d, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS t FROM daily
    ),
    st AS MATERIALIZED (
      SELECT AVG(y) AS mu, stddev_pop(y) AS sigma FROM idx
    ),
    z AS (
      SELECT a.t, a.d, a.y,
             SUM(power(1 - {_EWMA_LAMBDA}, a.t - b.t) * b.y)
               * {_EWMA_LAMBDA}
               + power(1 - {_EWMA_LAMBDA}, a.t) * MIN(st.mu) AS z
      FROM idx a JOIN idx b ON b.t <= a.t CROSS JOIN st
      GROUP BY a.t, a.d, a.y
    )
    SELECT z.t, z.d,
           round(z.y, 4) AS y,
           round(z.z, 6) AS ewma,
           round(st.mu + 3 * st.sigma
                 * sqrt({_EWMA_LAMBDA} / (2 - {_EWMA_LAMBDA})
                        * (1 - power((1 - {_EWMA_LAMBDA})
                                     * (1 - {_EWMA_LAMBDA}), z.t))), 6)
             AS ucl,
           round(st.mu - 3 * st.sigma
                 * sqrt({_EWMA_LAMBDA} / (2 - {_EWMA_LAMBDA})
                        * (1 - power((1 - {_EWMA_LAMBDA})
                                     * (1 - {_EWMA_LAMBDA}), z.t))), 6)
             AS lcl,
           (z.z > st.mu + 3 * st.sigma
                 * sqrt({_EWMA_LAMBDA} / (2 - {_EWMA_LAMBDA})
                        * (1 - power((1 - {_EWMA_LAMBDA})
                                     * (1 - {_EWMA_LAMBDA}), z.t)))
            OR z.z < st.mu - 3 * st.sigma
                 * sqrt({_EWMA_LAMBDA} / (2 - {_EWMA_LAMBDA})
                        * (1 - power((1 - {_EWMA_LAMBDA})
                                     * (1 - {_EWMA_LAMBDA}), z.t))))
             AS breach
    FROM z CROSS JOIN st
    ORDER BY z.t
    """,
)
def q_ewma_control(spark, sf_dir):
    """R661 — EWMA control chart (λ={lam}) over daily event counts:
    zₜ = λΣ(1−λ)^(t−s)·y_s + (1−λ)^t·μ₀ (the closed power-weighted
    form — no recursion), with the exact time-varying limits
    μ₀ ± 3σ·√(λ/(2−λ)·(1−(1−λ)^2t)) and per-day breach flags.  The
    drift MONITOR beside q_cusum_changepoint's offline change-point:
    EWMA flags small persistent shifts a Shewhart chart misses.
    Calendar-bounded series (30 days/SF); the only corpus-sized stage
    is the daily count agg.""".format(lam=_EWMA_LAMBDA)
    lam = _EWMA_LAMBDA
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    from arrow_supercluster_spark.functions.distrank import zip_scan

    idx0, _, _ = zip_scan(daily, ["d"], out="t0")
    idx = idx0.select("d", "y", (F.col("t0") + 1).alias("t"))
    st = idx.agg(
        F.avg("y").alias("mu"), F.stddev_pop("y").alias("sigma")
    )
    a = idx.select(
        F.col("t").alias("t"), F.col("d").alias("d"), F.col("y").alias("ya")
    )
    b = idx.select(F.col("t").alias("tb"), F.col("y").alias("yb"))
    z = (
        a.join(b, F.col("tb") <= F.col("t"))
        .crossJoin(F.broadcast(st))
        .groupBy("t", "d", "ya")
        .agg(
            (
                F.sum(
                    F.pow(F.lit(1 - lam), F.col("t") - F.col("tb"))
                    * F.col("yb")
                )
                * lam
                + F.pow(F.lit(1 - lam), F.col("t")) * F.min("mu")
            ).alias("z")
        )
    )
    half = F.lit(3.0) * F.col("sigma") * F.sqrt(
        F.lit(lam / (2 - lam))
        * (1 - F.pow(F.lit((1 - lam) * (1 - lam)), F.col("t")))
    )
    return (
        z.crossJoin(F.broadcast(st))
        .select(
            "t",
            "d",
            F.round("ya", 4).alias("y"),
            F.round("z", 6).alias("ewma"),
            F.round(F.col("mu") + half, 6).alias("ucl"),
            F.round(F.col("mu") - half, 6).alias("lcl"),
            (
                (F.col("z") > F.col("mu") + half)
                | (F.col("z") < F.col("mu") - half)
            ).alias("breach"),
        )
        .orderBy("t")
    )


# ===========================================================================
# R662 — survival concordance index (Harrell's C)
# ===========================================================================

_CIDX_CHURN_HOURS = 12

# Deterministic hash-sample cap for the quadratic pair stage (the
# q_sample_hash rule, now IMPLEMENTED, r10 — ADVICE r9 item 1): when the
# user dimension exceeds the cap, keep a user iff the portable affine
# hash (registry_ext114's 2654435761·x+12345 mod P — identical arithmetic
# in Spark and DuckDB, no engine-specific hash) lands in the first
# CAP/n_users slice of [0, 1e6).  Expected kept ≈ CAP → pairs ≤ CAP², a
# fixed distributed budget at ANY corpus size.  At every test SF
# (users ≤ 1500 at sf0.1) n ≤ CAP so the filter is the identity and the
# statistic stays exact.  All-integer: h%1e6 < 1e6 and n < 2^43 keeps
# the product inside int64.
_PAIR_USER_CAP = 20_000
_PH_P = 2_147_483_647


def _sql_hash_cap(src: str, key: str = "user_id") -> str:
    """SQL fragment pair: (count CTE, sampled CTE) over src."""
    return f"""
    n_{src} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {src}),
    s_{src} AS MATERIALIZED (
      SELECT * FROM {src}
      WHERE (SELECT n FROM n_{src}) <= {_PAIR_USER_CAP}
         OR ((2654435761 * ({key} % {_PH_P}) + 12345) % {_PH_P}) % 1000000
            * (SELECT n FROM n_{src}) < {_PAIR_USER_CAP} * 1000000
    )"""


def spark_hash_cap(df, key: str = "user_id"):
    """Spark side of _sql_hash_cap: identical affine-hash slice."""
    nu = df.agg(F.count(F.lit(1)).alias("__n_users"))
    h = F.pmod(
        F.lit(2654435761) * F.pmod(F.col(key), F.lit(_PH_P)) + 12345,
        F.lit(_PH_P),
    )
    return (
        df.crossJoin(F.broadcast(nu))  # 1-row scalar — always tiny
        .filter(
            (F.col("__n_users") <= _PAIR_USER_CAP)
            | (
                F.pmod(h, F.lit(1_000_000)) * F.col("__n_users")
                < _PAIR_USER_CAP * 1_000_000
            )
        )
        .drop("__n_users")
    )


@register(
    "q_cindex",
    f"""
    WITH g AS (SELECT MAX(ts) AS mx FROM events),
    u AS MATERIALIZED (
      SELECT user_id,
             CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
               AS dur_us,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS risk_cents,
             CAST(MAX(ts) < (SELECT mx FROM g)
                           - INTERVAL {_CIDX_CHURN_HOURS} HOUR AS INT)
               AS churned
      FROM events GROUP BY user_id
    ),{_sql_hash_cap("u")},
    pairs AS (
      SELECT CASE WHEN a.risk_cents > b.risk_cents THEN 1.0
                  WHEN a.risk_cents = b.risk_cents THEN 0.5
                  ELSE 0.0 END AS conc
      FROM s_u a JOIN s_u b
        ON a.user_id <> b.user_id
       AND a.churned = 1 AND a.dur_us < b.dur_us
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS comparable_pairs,
           round(SUM(conc) / COUNT(*), 6) AS c_index
    FROM pairs
    """,
)
def q_cindex(spark, sf_dir):
    """R662 — Harrell's concordance index: risk = per-user purchase
    total in EXACT integer cents, survival time = first→last event
    span in integer microseconds, event (churn) = last activity more
    than {d} hours before the corpus horizon (the fixture's users are
    active to within ~9 h of the horizon on average — a day-scale
    window would censor everyone).  A pair is comparable iff
    the shorter-lived user churned; concordant iff the shorter-lived
    user carries the higher risk (ties 0.5).  All comparisons are
    integer-exact.  Pairs join the USER DIMENSION against itself; the
    deterministic portable-hash sample cap (spark_hash_cap, mirrored
    in the twin by _sql_hash_cap) bounds the pair stage to <= CAP^2 at
    ANY corpus size, and the join carries NO broadcast hint — AQE
    decides from the capped runtime size (the ext220 rule).""".format(
        d=_CIDX_CHURN_HOURS
    )
    ev = read_events(spark, sf_dir)
    g = ev.agg(F.max("ts").alias("mx"))
    u = (
        ev.groupBy("user_id")
        .agg(
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("dur_us"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("risk_cents"),
            F.max("ts").alias("last_ts"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            "user_id",
            "dur_us",
            "risk_cents",
            (
                F.col("last_ts")
                < F.col("mx") - F.expr(f"INTERVAL {_CIDX_CHURN_HOURS} HOUR")
            )
            .cast("int")
            .alias("churned"),
        )
    )
    us = spark_hash_cap(u)
    a = us.select(
        F.col("user_id").alias("a_id"),
        F.col("dur_us").alias("a_dur"),
        F.col("risk_cents").alias("a_risk"),
        "churned",
    ).filter(F.col("churned") == 1)
    b = us.select(
        F.col("user_id").alias("b_id"),
        F.col("dur_us").alias("b_dur"),
        F.col("risk_cents").alias("b_risk"),
    )
    pairs = a.join(
        b,
        (F.col("a_id") != F.col("b_id")) & (F.col("a_dur") < F.col("b_dur")),
    )
    conc = (
        F.when(F.col("a_risk") > F.col("b_risk"), 1.0)
        .when(F.col("a_risk") == F.col("b_risk"), 0.5)
        .otherwise(0.0)
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("comparable_pairs"),
        F.round(F.sum(conc) / F.count(F.lit(1)), 6).alias("c_index"),
    )


# ===========================================================================
# R663 — lag-1 Granger-style F test (views → purchases)
# ===========================================================================


@register(
    "q_granger_lite",
    """
    WITH dv AS MATERIALIZED (
      SELECT date_trunc('day', ts) AS d,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    idx AS MATERIALIZED (
      SELECT x, y, ROW_NUMBER() OVER (ORDER BY d) AS t FROM dv
    ),
    s AS MATERIALIZED (
      SELECT cur.y AS w, prev.y AS u, prev.x AS v
      FROM idx cur JOIN idx prev ON prev.t = cur.t - 1
    ),
    m AS MATERIALIZED (
      SELECT COUNT(*) AS n, AVG(w) AS mw, AVG(u) AS mu, AVG(v) AS mv
      FROM s
    ),
    c AS MATERIALIZED (
      SELECT MIN(m.n) AS n,
             SUM((u - m.mu) * (u - m.mu)) AS suu,
             SUM((v - m.mv) * (v - m.mv)) AS svv,
             SUM((u - m.mu) * (v - m.mv)) AS suv,
             SUM((u - m.mu) * (w - m.mw)) AS suw,
             SUM((v - m.mv) * (w - m.mw)) AS svw,
             SUM((w - m.mw) * (w - m.mw)) AS sww
      FROM s CROSS JOIN m
    )
    SELECT CAST(n AS BIGINT) AS n_samples,
           round((suw * svv - svw * suv) / (suu * svv - suv * suv), 6)
             AS beta_self,
           round((svw * suu - suw * suv) / (suu * svv - suv * suv), 6)
             AS beta_cross,
           round(sww - ((suw * svv - svw * suv) * suw
                        + (svw * suu - suw * suv) * svw)
                       / (suu * svv - suv * suv), 6) AS rss_full,
           round(sww - suw * suw / suu, 6) AS rss_restricted,
           round(((sww - suw * suw / suu)
                  - (sww - ((suw * svv - svw * suv) * suw
                            + (svw * suu - suw * suv) * svw)
                           / (suu * svv - suv * suv)))
                 * (n - 3)
                 / (sww - ((suw * svv - svw * suv) * suw
                           + (svw * suu - suw * suv) * svw)
                          / (suu * svv - suv * suv)), 6) AS f_stat
    FROM c
    """,
)
def q_granger_lite(spark, sf_dir):
    """R663 — lag-1 Granger-style causality screen: regress today's
    purchase count on yesterday's purchases (restricted) vs yesterday's
    purchases AND yesterday's views (full), F = (RSS_r − RSS_f)(n−3)/
    RSS_f for the one extra regressor.  Closed-form 2-predictor OLS via
    CENTERED 2×2 normal equations — six sums, one determinant, no
    iteration (the 2-var sibling of q_ols_2var).  Calendar-bounded
    series; the only corpus-sized stage is the daily conditional agg."""
    ev = read_events(spark, sf_dir)
    dv = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("double")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("y"),
    )
    from arrow_supercluster_spark.functions.distrank import zip_scan

    idx0, _, _ = zip_scan(dv, ["d"], out="t0")
    idx = idx0.select("x", "y", (F.col("t0") + 1).alias("t"))
    cur = idx.select(F.col("y").alias("w"), F.col("t").alias("t"))
    prev = idx.select(
        F.col("y").alias("u"), F.col("x").alias("v"),
        (F.col("t") + 1).alias("t"),
    )
    s = cur.join(prev, "t").select("w", "u", "v")
    m = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("w").alias("mw"),
        F.avg("u").alias("mu"),
        F.avg("v").alias("mv"),
    )
    c = (
        s.crossJoin(F.broadcast(m))
        .agg(
            F.min("n").alias("n"),
            F.sum((F.col("u") - F.col("mu")) * (F.col("u") - F.col("mu"))).alias("suu"),
            F.sum((F.col("v") - F.col("mv")) * (F.col("v") - F.col("mv"))).alias("svv"),
            F.sum((F.col("u") - F.col("mu")) * (F.col("v") - F.col("mv"))).alias("suv"),
            F.sum((F.col("u") - F.col("mu")) * (F.col("w") - F.col("mw"))).alias("suw"),
            F.sum((F.col("v") - F.col("mv")) * (F.col("w") - F.col("mw"))).alias("svw"),
            F.sum((F.col("w") - F.col("mw")) * (F.col("w") - F.col("mw"))).alias("sww"),
        )
    )
    det = F.col("suu") * F.col("svv") - F.col("suv") * F.col("suv")
    b_self = (F.col("suw") * F.col("svv") - F.col("svw") * F.col("suv")) / det
    b_cross = (F.col("svw") * F.col("suu") - F.col("suw") * F.col("suv")) / det
    rss_full = F.col("sww") - (
        (F.col("suw") * F.col("svv") - F.col("svw") * F.col("suv")) * F.col("suw")
        + (F.col("svw") * F.col("suu") - F.col("suw") * F.col("suv")) * F.col("svw")
    ) / det
    rss_r = F.col("sww") - F.col("suw") * F.col("suw") / F.col("suu")
    return c.select(
        F.col("n").cast("long").alias("n_samples"),
        F.round(b_self, 6).alias("beta_self"),
        F.round(b_cross, 6).alias("beta_cross"),
        F.round(rss_full, 6).alias("rss_full"),
        F.round(rss_r, 6).alias("rss_restricted"),
        F.round((rss_r - rss_full) * (F.col("n") - 3) / rss_full, 6).alias(
            "f_stat"
        ),
    )


# ===========================================================================
# R664 — Johnson-Lindenstrauss ±1 random projection (pinned matrix)
# ===========================================================================

_RP_OUT = 16  # projected dimensionality
_RP_A, _RP_B, _RP_M = 2654435761, 40503, 2147483647


def _rp_sign_sql(j: str, k: str) -> str:
    """Pinned ±1 entry of the projection matrix: pure integer
    arithmetic, identical in both engines."""
    return f"(1 - 2 * ((({_RP_A} * {j} + {_RP_B} * {k} + 7) % {_RP_M}) % 2))"


@register(
    "q_random_projection",
    f"""
    WITH pr AS MATERIALIZED (
      SELECT vec_id, embedding,
             list_transform(range(1, 16 + 1), k ->
               list_sum(list_transform(range(1, 65), j ->
                 CAST(embedding[j] AS DOUBLE)
                 * (1 - 2 * (((2654435761 * j + 40503 * k + 7) % 2147483647) % 2))))) AS p
      FROM embeddings
    ),
    pairs AS MATERIALIZED (
      SELECT a.vec_id AS id,
             list_sum(list_transform(range(1, 16 + 1), k ->
               (a.p[k] - b.p[k]) * (a.p[k] - b.p[k]))) AS dproj,
             list_sum(list_transform(range(1, 65), j ->
               (CAST(a.embedding[j] AS DOUBLE)
                - CAST(b.embedding[j] AS DOUBLE))
               * (CAST(a.embedding[j] AS DOUBLE)
                  - CAST(b.embedding[j] AS DOUBLE)))) AS dorig
      FROM pr a JOIN pr b ON b.vec_id = a.vec_id + 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(AVG(dproj / (16 * dorig)), 6) AS mean_ratio,
           round(stddev_pop(dproj / (16 * dorig)), 6) AS sd_ratio,
           round(MIN(dproj / (16 * dorig)), 6) AS min_ratio,
           round(MAX(dproj / (16 * dorig)), 6) AS max_ratio
    FROM pairs WHERE dorig > 0
    """,
)
def q_random_projection(spark, sf_dir):
    """R664 — JL random projection 64→{d} dims with a PINNED ±1 sign
    matrix (sign(j,k) from pure integer arithmetic — no engine RNG, so
    the projection is bit-reproducible everywhere).  Audit output: over
    adjacent embedding pairs, the ratio ‖R(a−b)‖²/(d'·‖a−b‖²) whose
    expectation is EXACTLY 1 (E‖Rx‖² = d'‖x‖² for ±1 entries) —
    mean/sd/min/max of the ratio quantify the distance distortion the
    16× cheaper downstream kNN would see.  Narrow per-row map + one
    adjacent-pair join; no shuffle beyond the pair join.""".format(
        d=_RP_OUT
    )
    emb = _emb(spark, sf_dir)

    def project(vec):
        # outer transform over k = 1..16, inner left-fold over j = 1..64
        # (the same association order as list_sum's left fold)
        return F.transform(
            F.sequence(F.lit(1), F.lit(_RP_OUT)),
            lambda k: F.aggregate(
                F.sequence(F.lit(1), F.lit(64)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(vec, j).cast("double")
                * (
                    F.lit(1)
                    - 2 * (((_RP_A * j + _RP_B * k + 7) % _RP_M) % 2)
                ),
            ),
        )

    pr = emb.select(
        "vec_id", project(F.col("embedding")).alias("p"), F.col("embedding")
    )
    a = pr.select(
        F.col("vec_id").alias("id"), F.col("p").alias("pa"),
        F.col("embedding").alias("ea"),
    )
    b = pr.select(
        (F.col("vec_id") - 1).alias("id"), F.col("p").alias("pb"),
        F.col("embedding").alias("eb"),
    )
    pairs = a.join(b, "id")
    dproj = F.aggregate(
        F.zip_with(F.col("pa"), F.col("pb"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    dorig = F.aggregate(
        F.zip_with(
            F.col("ea"),
            F.col("eb"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    r = pairs.select((dproj / (_RP_OUT * dorig)).alias("ratio")).filter(
        dorig > 0
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("ratio"), 6).alias("mean_ratio"),
        F.round(F.stddev_pop("ratio"), 6).alias("sd_ratio"),
        F.round(F.min("ratio"), 6).alias("min_ratio"),
        F.round(F.max("ratio"), 6).alias("max_ratio"),
    )
