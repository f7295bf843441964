"""Round-5 registry additions, batch 124 — game-theoretic attribution,
robust location, and population estimation:

- q_shapley_attribution: EXACT Shapley-value channel attribution over
  the 4 non-purchase event types — users group by exposure BITMASK
  (16 coalitions), v(S) = conversion rate of users exposed to exactly
  S, and each channel's Shapley value is the weighted sum of marginal
  contributions over all coalitions (|S|!(n−1−|S|)!/n! weights as
  literals; terms integer-scaled before the per-channel sum). The
  fair-division upgrade of last-touch (R69) and Markov (R194)
  attribution — exact because the channel universe is small, which is
  precisely when Shapley is tractable.
- q_geometric_median: Weiszfeld iteration (3 steps, chained CTEs /
  a 3-step bounded driver loop) for the geometric median of a city's
  points — the L1 location estimator that, unlike the centroid,
  doesn't chase outliers. All per-iteration sums are integer-scaled
  (weights 1/d and weighted coordinates), so every step is bit-stable.
- q_capture_recapture: Lincoln-Petersen / Chapman population estimate
  — treat two disjoint time windows as capture samples, estimate the
  total user population from the overlap, compare to the true count.
  The estimate-what-you-can't-enumerate primitive (how many users
  exist, not just how many you saw).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import derived_points

_SH_CHANNELS = ("click", "error", "signup", "view")  # bit order
_SH_N = 4
_SH_SCALE = 1_000_000_000
_GM_CITY = "city_3"
_GM_ITERS = 3
_GM_SCALE = 1_000_000


def _sh_weight(s_size: int) -> float:
    return (
        math.factorial(s_size)
        * math.factorial(_SH_N - 1 - s_size)
        / math.factorial(_SH_N)
    )


# ===========================================================================
# R366 — exact Shapley attribution
# ===========================================================================

def _sql_shapley() -> str:
    bit = {c: 1 << i for i, c in enumerate(_SH_CHANNELS)}
    mask_expr = " + ".join(
        f"MAX(CASE WHEN event_type = '{c}' THEN {b} ELSE 0 END)"
        for c, b in bit.items()
    )
    wcases = " ".join(
        f"WHEN {s} THEN {_sh_weight(s)!r}" for s in range(_SH_N)
    )
    popcnt = "+".join(f"(S.m >> {k}) & 1" for k in range(_SH_N))
    chan_names = " UNION ALL ".join(
        f"SELECT {i} AS ch, '{c}' AS channel"
        for i, c in enumerate(_SH_CHANNELS)
    )
    return f"""
    WITH per_user AS (
      SELECT user_id,
             {mask_expr} AS mask,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT mask, SUM(converted) * 1.0 / COUNT(*) AS v
      FROM per_user GROUP BY mask
    ),
    masks AS (SELECT unnest(range(0, {1 << _SH_N})) AS m),
    chans AS ({chan_names}),
    terms AS (
      SELECT chans.ch, chans.channel,
             CAST(round((coalesce(v1.v, 0.0) - coalesce(v0.v, 0.0))
                        * (CASE ({popcnt}) {wcases} END)
                        * {_SH_SCALE}) AS BIGINT) AS t
      FROM chans JOIN masks S ON (S.m >> chans.ch) & 1 = 0
      LEFT JOIN v v0 ON v0.mask = S.m
      LEFT JOIN v v1 ON v1.mask = S.m + (1 << chans.ch)
    )
    SELECT channel,
           round(SUM(t) * 1.0 / {_SH_SCALE}, 6) AS shapley
    FROM terms
    GROUP BY channel
    ORDER BY channel
    """


@register("q_shapley_attribution", _sql_shapley())
def q_shapley_attribution(spark, sf_dir):
    """R366 — exact Shapley channel attribution: exposure coalitions =
    per-user bitmask over {ch}; v(S) = conversion rate of the
    exactly-S users (0 for unseen coalitions); φ_i = Σ_(S∌i)
    |S|!(n−1−|S|)!/n! · (v(S∪i) − v(S)) with factorial weights as
    Python-evaluated literals and every term integer-scaled before the
    per-channel sum (8 terms each — association order can't move the
    result). 2^n coalition rows make exact Shapley a broadcast-sized
    problem whenever the channel universe is small — the regime where
    it beats heuristic attribution outright. Σφ over channels equals
    v(full) − v(∅) (the efficiency axiom), asserted in
    tests/test_batch124.py.""".format(ch=list(_SH_CHANNELS))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    mask = None
    for i, c in enumerate(_SH_CHANNELS):
        term = F.max(
            F.when(F.col("event_type") == c, 1 << i).otherwise(0)
        )
        mask = term if mask is None else mask + term
    per_user = ev.groupBy("user_id").agg(
        mask.alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    v = per_user.groupBy("mask").agg(
        (F.sum("converted") * 1.0 / F.count(F.lit(1))).alias("v")
    )
    masks = spark.range(1 << _SH_N).select(F.col("id").alias("m"))
    chans = spark.createDataFrame(
        [(i, 1 << i, c) for i, c in enumerate(_SH_CHANNELS)],
        "ch int, bitval long, channel string",
    )
    pairs = chans.join(masks, F.col("m").bitwiseAND(F.col("bitval")) == 0)
    popcnt = F.bit_count("m")
    wexpr = None
    for s in range(_SH_N):
        wexpr = (
            F.when(popcnt == s, F.lit(_sh_weight(s)))
            if wexpr is None
            else wexpr.when(popcnt == s, F.lit(_sh_weight(s)))
        )
    v0 = v.select(F.col("mask").alias("m0"), F.col("v").alias("v0"))
    v1 = v.select(F.col("mask").alias("m1"), F.col("v").alias("v1"))
    terms = (
        pairs.join(v0, F.col("m") == F.col("m0"), "left")
        .join(
            v1,
            F.col("m") + F.col("bitval") == F.col("m1"),
            "left",
        )
        .select(
            "channel",
            F.round(
                (
                    F.coalesce("v1", F.lit(0.0))
                    - F.coalesce("v0", F.lit(0.0))
                )
                * wexpr
                * _SH_SCALE
            )
            .cast("long")
            .alias("t"),
        )
    )
    return (
        terms.groupBy("channel")
        .agg(
            F.round(F.sum("t") * 1.0 / _SH_SCALE, 6).alias("shapley")
        )
        .orderBy("channel")
    )


# ===========================================================================
# R367 — geometric median (Weiszfeld, bounded iterations)
# ===========================================================================

@register(
    "q_geometric_median",
    f"""
    WITH pts AS (
      SELECT lng AS x, lat AS y
      FROM (
        SELECT
          CASE WHEN c_custkey % 97 = 0 THEN NULL
               ELSE -180.0 + 360.0 * (((c_custkey * 16807) % 2147483647)
                                      / 2147483647.0) END AS lng,
          CASE WHEN c_custkey % 97 = 0 THEN NULL
               ELSE -85.0 + 170.0 * ((((c_custkey * 16807) % 2147483647)
                                      * 16807 % 2147483647)
                                     / 2147483647.0) END AS lat,
          'city_' || CAST(c_custkey % 20 AS VARCHAR) AS city
        FROM customer
      ) WHERE city = '{_GM_CITY}' AND lng IS NOT NULL
    ),
    e0 AS (
      SELECT SUM(CAST(round(x * {_GM_SCALE}) AS BIGINT)) * 1.0
               / ({_GM_SCALE} * COUNT(*)) AS gx,
             SUM(CAST(round(y * {_GM_SCALE}) AS BIGINT)) * 1.0
               / ({_GM_SCALE} * COUNT(*)) AS gy
      FROM pts
    ),
    {','.join(f'''
    e{i} AS (
      SELECT SUM(CAST(round(x / d * {_GM_SCALE}) AS BIGINT)) * 1.0
               / SUM(CAST(round(1.0 / d * {_GM_SCALE}) AS BIGINT)) AS gx,
             SUM(CAST(round(y / d * {_GM_SCALE}) AS BIGINT)) * 1.0
               / SUM(CAST(round(1.0 / d * {_GM_SCALE}) AS BIGINT)) AS gy
      FROM (
        SELECT x, y,
               greatest(sqrt((x - e{i-1}.gx) * (x - e{i-1}.gx)
                             + (y - e{i-1}.gy) * (y - e{i-1}.gy)), 1e-9)
                 AS d
        FROM pts CROSS JOIN e{i-1}
      )
    )''' for i in range(1, _GM_ITERS + 1))}
    ,
    cost AS (
      SELECT
        SUM(CAST(round(sqrt((x - e0.gx) * (x - e0.gx)
                            + (y - e0.gy) * (y - e0.gy))
                       * {_GM_SCALE}) AS BIGINT)) AS c_centroid,
        SUM(CAST(round(sqrt((x - e{_GM_ITERS}.gx) * (x - e{_GM_ITERS}.gx)
                            + (y - e{_GM_ITERS}.gy) * (y - e{_GM_ITERS}.gy))
                       * {_GM_SCALE}) AS BIGINT)) AS c_median,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM pts CROSS JOIN e0 CROSS JOIN e{_GM_ITERS}
    )
    SELECT round(e{_GM_ITERS}.gx, 6) AS med_x,
           round(e{_GM_ITERS}.gy, 6) AS med_y,
           round(e0.gx, 6) AS centroid_x, round(e0.gy, 6) AS centroid_y,
           cost.n,
           round(cost.c_centroid * 1.0 / {_GM_SCALE}, 4) AS cost_centroid,
           round(cost.c_median * 1.0 / {_GM_SCALE}, 4) AS cost_median
    FROM e{_GM_ITERS} CROSS JOIN e0 CROSS JOIN cost
    """,
)
def q_geometric_median(spark, sf_dir):
    """R367 — geometric median of {c}'s points by {k} Weiszfeld steps:
    start at the centroid, iterate x ← Σ(p/d)/Σ(1/d) with d clamped
    away from zero; every iteration's numerators/denominators are
    INTEGER-scaled sums (order-independent), so the whole trajectory
    is bit-stable across engines and partitionings. Output: the median
    vs the centroid with both total-distance costs — the median's cost
    must be ≤ (Weiszfeld descends; asserted in tests). One agg per
    iteration (the estimate is a broadcast scalar pair), a bounded
    {k}-step driver loop — the robust-location counterpart of the
    weighted centroid the cluster engine uses.""".format(
        c=_GM_CITY, k=_GM_ITERS
    )
    pts = (
        derived_points(spark, sf_dir, with_nulls=True)
        .filter((F.col("city") == _GM_CITY) & F.col("lng").isNotNull())
        .select(F.col("lng").alias("x"), F.col("lat").alias("y"))
    )
    e0 = pts.agg(
        (
            F.sum(F.round(F.col("x") * _GM_SCALE).cast("long"))
            * 1.0
            / (_GM_SCALE * F.count(F.lit(1)))
        ).alias("gx"),
        (
            F.sum(F.round(F.col("y") * _GM_SCALE).cast("long"))
            * 1.0
            / (_GM_SCALE * F.count(F.lit(1)))
        ).alias("gy"),
    ).collect()[0]
    gx, gy = float(e0.gx), float(e0.gy)
    cx, cy = gx, gy
    for _ in range(_GM_ITERS):
        d = F.greatest(
            F.sqrt(
                (F.col("x") - gx) * (F.col("x") - gx)
                + (F.col("y") - gy) * (F.col("y") - gy)
            ),
            F.lit(1e-9),
        )
        row = pts.agg(
            F.sum(F.round(F.col("x") / d * _GM_SCALE).cast("long")).alias(
                "nx"
            ),
            F.sum(F.round(F.col("y") / d * _GM_SCALE).cast("long")).alias(
                "ny"
            ),
            F.sum(F.round(F.lit(1.0) / d * _GM_SCALE).cast("long")).alias(
                "dd"
            ),
        ).collect()[0]
        gx = row.nx * 1.0 / row.dd
        gy = row.ny * 1.0 / row.dd
    dist = lambda px, py: F.sqrt(
        (F.col("x") - px) * (F.col("x") - px)
        + (F.col("y") - py) * (F.col("y") - py)
    )
    return pts.agg(
        F.lit(round(gx, 6)).alias("med_x"),
        F.lit(round(gy, 6)).alias("med_y"),
        F.lit(round(cx, 6)).alias("centroid_x"),
        F.lit(round(cy, 6)).alias("centroid_y"),
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(dist(cx, cy) * _GM_SCALE).cast("long"))
            * 1.0
            / _GM_SCALE,
            4,
        ).alias("cost_centroid"),
        F.round(
            F.sum(F.round(dist(gx, gy) * _GM_SCALE).cast("long"))
            * 1.0
            / _GM_SCALE,
            4,
        ).alias("cost_median"),
    )


# ===========================================================================
# R368 — capture-recapture population estimate
# ===========================================================================

@register(
    "q_capture_recapture",
    """
    WITH w1 AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(strftime(ts, '%d') AS INTEGER) <= 10
    ),
    w2 AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(strftime(ts, '%d') AS INTEGER) BETWEEN 11 AND 20
    ),
    m AS (SELECT COUNT(*) AS m FROM w1 JOIN w2 USING (user_id)),
    tot AS (SELECT COUNT(DISTINCT user_id) AS n_true FROM events)
    SELECT CAST((SELECT COUNT(*) FROM w1) AS BIGINT) AS n1,
           CAST((SELECT COUNT(*) FROM w2) AS BIGINT) AS n2,
           CAST(m.m AS BIGINT) AS overlap,
           round((SELECT COUNT(*) FROM w1) * 1.0
                 * (SELECT COUNT(*) FROM w2) / m.m, 4)
             AS lincoln_petersen,
           round(((SELECT COUNT(*) FROM w1) + 1.0)
                 * ((SELECT COUNT(*) FROM w2) + 1.0) / (m.m + 1.0) - 1.0, 4)
             AS chapman,
           CAST(tot.n_true AS BIGINT) AS n_true
    FROM m CROSS JOIN tot
    """,
)
def q_capture_recapture(spark, sf_dir):
    """R368 — Lincoln-Petersen / Chapman population estimation: two
    disjoint 10-day windows are the capture samples; N̂ = n₁n₂/m from
    the recapture overlap (Chapman's +1 correction alongside), against
    the true distinct-user count the synthetic corpus lets us verify.
    The estimate-the-unseen primitive — dedup completeness, bot
    population sizing, species-style richness — in three exact-integer
    aggs."""
    from arrow_supercluster_spark.sources.tables import read_events

    ev = read_events(spark, sf_dir)
    w1 = ev.filter(F.dayofmonth("ts") <= 10).select("user_id").distinct()
    w2 = ev.filter(
        (F.dayofmonth("ts") >= 11) & (F.dayofmonth("ts") <= 20)
    ).select("user_id").distinct()
    n1 = w1.count()
    n2 = w2.count()
    m = w1.join(w2, "user_id").count()
    n_true = ev.select("user_id").distinct().count()
    lp = round(n1 * 1.0 * n2 / m, 4)
    ch = round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 4)
    return spark.createDataFrame(
        [(n1, n2, m, lp, ch, n_true)],
        "n1 long, n2 long, overlap long, lincoln_petersen double, "
        "chapman double, n_true long",
    )
