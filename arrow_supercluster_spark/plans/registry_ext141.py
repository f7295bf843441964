"""Round-5 registry additions, batch 136 — fluctuation scaling, clock
stability, and motif discovery:

- q_taylors_law: Taylor's power law (fluctuation scaling) — across
  users, the variance of weekly activity scales as Var ∝ Meanᵇ; the
  exponent b from the log-log OLS over per-user (mean, var) points
  (integer weekly counts → exact moments; log coords integer-scaled).
  b ≈ 1 ⇒ Poisson-like users, b → 2 ⇒ synchronized bursts — the
  fluctuation-scaling member of the empirical-law family
  (Zipf/Heaps/Benford/Fano).
- q_allan_variance: (non-overlapping) Allan variance of the daily
  event rate at τ = 1/2/4 days — σ²_A(τ) = ½·mean((ȳ_{{i+1}} −
  ȳ_i)²) over adjacent τ-block means. The drift-vs-noise diagnostic
  clocks use, applied to arrival-rate stability: white noise falls as
  1/τ, drift flattens or rises.
- q_matrix_profile: matrix-profile-lite over the daily count series —
  for every 7-day subsequence, the z-normalized distance to its
  nearest non-overlapping neighbor; the minimum is the MOTIF pair
  (repeated weekly shape), the maximum the DISCORD (the anomaly no
  other week resembles). All-pairs over the bounded subsequence set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_TL_SCALE = 1_000_000_000
_AV_TAUS = (1, 2, 4)
_MP_W = 7
_MP_SCALE = 1_000_000


# ===========================================================================
# R401 — Taylor's power law
# ===========================================================================

@register(
    "q_taylors_law",
    f"""
    WITH uw AS (
      SELECT user_id, (CAST(strftime(ts, '%d') AS INTEGER) - 1) // 7 AS w,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    weeks AS (SELECT DISTINCT w FROM uw),
    grid AS (
      SELECT u.user_id, wk.w, coalesce(uw.c, 0) AS c
      FROM (SELECT DISTINCT user_id FROM uw) u
      CROSS JOIN weeks wk
      LEFT JOIN uw ON uw.user_id = u.user_id AND uw.w = wk.w
    ),
    mv AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(c) AS s, SUM(c * c) AS ssq
      FROM grid GROUP BY user_id
    ),
    pts AS (
      SELECT CAST(round(ln(s * 1.0 / k) * {_TL_SCALE}) AS BIGINT) AS x_s,
             CAST(round(ln((ssq - s * 1.0 * s / k) / (k - 1))
                        * {_TL_SCALE}) AS BIGINT) AS y_s
      FROM mv
      WHERE s > 0 AND (ssq - s * 1.0 * s / k) > 0
    ),
    reg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x_s) AS sx, SUM(y_s) AS sy,
             SUM(CAST(round(x_s * 1.0 * y_s / {_TL_SCALE}) AS BIGINT))
               AS sxy,
             SUM(CAST(round(x_s * 1.0 * x_s / {_TL_SCALE}) AS BIGINT))
               AS sxx
      FROM pts
    )
    SELECT n AS n_users,
           round((sxy - sx * 1.0 * sy / ({_TL_SCALE} * 1.0 * n))
                 / (sxx - sx * 1.0 * sx / ({_TL_SCALE} * 1.0 * n)), 6)
             AS taylor_b,
           round(exp(sy * 1.0 / ({_TL_SCALE} * 1.0 * n)
                     - (sxy - sx * 1.0 * sy / ({_TL_SCALE} * 1.0 * n))
                       / (sxx - sx * 1.0 * sx / ({_TL_SCALE} * 1.0 * n))
                       * (sx * 1.0 / ({_TL_SCALE} * 1.0 * n))), 6)
             AS taylor_a
    FROM reg
    """,
)
def q_taylors_law(spark, sf_dir):
    """R401 — Taylor's power law across users: per-user weekly counts
    (densified — silent weeks are zeros) → exact integer mean/variance
    moments → log-log OLS of Var on Mean with integer-scaled
    coordinates and cross terms (order-free sums). b is the
    fluctuation-scaling exponent: 1 = independent Poisson behavior,
    2 = perfectly synchronized bursts; most human activity lands
    between — and a CHANGE in b is an early behavioral-mix alarm. The
    fluctuation member of the corpus-law family (Zipf R115, Heaps
    R144, Benford R139, Fano R122)."""
    ev = read_events(spark, sf_dir)
    uw = ev.groupBy(
        "user_id",
        ((F.dayofmonth("ts") - 1) / 7).cast("long").alias("w"),
    ).agg(F.count(F.lit(1)).alias("c"))
    weeks = uw.select("w").distinct()
    users = uw.select("user_id").distinct()
    grid = (
        users.crossJoin(F.broadcast(weeks))
        .join(uw, ["user_id", "w"], "left")
        .select("user_id", F.coalesce("c", F.lit(0)).alias("c"))
    )
    mv = grid.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ssq"),
    )
    var = (F.col("ssq") - F.col("s") * 1.0 * F.col("s") / F.col("k")) / (
        F.col("k") - 1
    )
    pts = mv.filter((F.col("s") > 0) & (var > 0)).select(
        F.round(F.log(F.col("s") * 1.0 / F.col("k")) * _TL_SCALE)
        .cast("long")
        .alias("x_s"),
        F.round(F.log(var) * _TL_SCALE).cast("long").alias("y_s"),
    )
    reg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x_s").alias("sx"),
        F.sum("y_s").alias("sy"),
        F.sum(
            F.round(F.col("x_s") * 1.0 * F.col("y_s") / _TL_SCALE)
            .cast("long")
        ).alias("sxy"),
        F.sum(
            F.round(F.col("x_s") * 1.0 * F.col("x_s") / _TL_SCALE)
            .cast("long")
        ).alias("sxx"),
    )
    n = F.col("n")
    slope = (
        F.col("sxy") - F.col("sx") * 1.0 * F.col("sy") / (_TL_SCALE * 1.0 * n)
    ) / (
        F.col("sxx") - F.col("sx") * 1.0 * F.col("sx") / (_TL_SCALE * 1.0 * n)
    )
    intercept = F.col("sy") * 1.0 / (_TL_SCALE * 1.0 * n) - slope * (
        F.col("sx") * 1.0 / (_TL_SCALE * 1.0 * n)
    )
    return reg.select(
        n.cast("long").alias("n_users"),
        F.round(slope, 6).alias("taylor_b"),
        F.round(F.exp(intercept), 6).alias("taylor_a"),
    )


# ===========================================================================
# R402 — Allan variance of the daily rate
# ===========================================================================

def _sql_allan(tau: int) -> str:
    return f"""
    SELECT {tau} AS tau,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(0.5 * AVG((b.m - a.m) * (b.m - a.m)), 4) AS allan_var
    FROM (
      SELECT d // {tau} AS blk, SUM(c) * 1.0 / {tau} AS m
      FROM series GROUP BY 1 HAVING COUNT(*) = {tau}
    ) a
    JOIN (
      SELECT d // {tau} AS blk, SUM(c) * 1.0 / {tau} AS m
      FROM series GROUP BY 1 HAVING COUNT(*) = {tau}
    ) b ON b.blk = a.blk + 1
    """


@register(
    "q_allan_variance",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) - 1 AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    series AS (
      SELECT g.d, coalesce(daily.c, 0) AS c
      FROM (SELECT unnest(range(0, 1 + (SELECT MAX(d) FROM daily))) AS d) g
      LEFT JOIN daily ON g.d = daily.d
    )
    {' UNION ALL '.join(f'({_sql_allan(t)})' for t in _AV_TAUS)}
    ORDER BY tau
    """,
)
def q_allan_variance(spark, sf_dir):
    """R402 — Allan variance of the daily event rate at τ ∈ {ts}:
    σ²_A(τ) = ½·mean over adjacent complete τ-day blocks of the
    squared block-mean difference. Block means are integer-count sums
    over ≤4-day blocks divided once; the pair frame is calendar
    -bounded, so the AVG runs over ≤30 deterministic doubles. The
    noise-identification curve from clock metrology: white arrival
    noise gives σ²_A ∝ 1/τ; a flattening curve exposes drift the
    plain variance hides under averaging. Complements q_hurst_rs
    (same question, rescaled-range language).""".format(
        ts=list(_AV_TAUS)
    )
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy((F.dayofmonth("ts") - 1).alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mx = daily.agg(F.max("d").alias("mx"))
    grid = mx.select(
        F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("d")
    )
    series = grid.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    out = None
    for tau in _AV_TAUS:
        blocks = (
            series.groupBy(
                F.floor(F.col("d") / tau).cast("long").alias("blk")
            )
            .agg(
                (F.sum("c") * 1.0 / tau).alias("m"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .filter(F.col("cnt") == tau)
        )
        a = blocks.select(F.col("blk").alias("ba"), F.col("m").alias("ma"))
        b = blocks.select(
            (F.col("blk") - 1).alias("ba"), F.col("m").alias("mb")
        )
        pairs = a.join(b, "ba")
        row = pairs.agg(
            F.lit(tau).alias("tau"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                0.5
                * F.avg(
                    (F.col("mb") - F.col("ma"))
                    * (F.col("mb") - F.col("ma"))
                ),
                4,
            ).alias("allan_var"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("tau")


# ===========================================================================
# R403 — matrix-profile-lite motif/discord discovery
# ===========================================================================

@register(
    "q_matrix_profile",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) - 1 AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    series AS (
      SELECT g.d, coalesce(daily.c, 0) AS c
      FROM (SELECT unnest(range(0, 1 + (SELECT MAX(d) FROM daily))) AS d) g
      LEFT JOIN daily ON g.d = daily.d
    ),
    arr AS (SELECT list(c ORDER BY d) AS cs,
                   CAST(COUNT(*) AS BIGINT) AS n FROM series),
    subs AS (
      SELECT i.i AS start,
             list_transform(range(0, {_MP_W}),
                            k -> CAST(arr.cs[i.i + k + 1] AS DOUBLE)) AS w
      FROM arr CROSS JOIN (
        SELECT unnest(range(0, CAST((SELECT n FROM arr) AS INTEGER)
                               - {_MP_W} + 1)) AS i
      ) i
    ),
    znorm AS (
      SELECT start,
             list_transform(w, x ->
               (x - list_sum(w) / {_MP_W})
               / greatest(sqrt(list_sum(list_transform(w, y ->
                   (y - list_sum(w) / {_MP_W})
                   * (y - list_sum(w) / {_MP_W}))) / {_MP_W}), 1e-9)) AS z
      FROM subs
    ),
    dists AS (
      SELECT a.start AS sa, b.start AS sb,
             CAST(round(sqrt(list_sum(list_transform(range(1, {_MP_W} + 1),
               k -> (a.z[k] - b.z[k]) * (a.z[k] - b.z[k]))))
               * {_MP_SCALE}) AS BIGINT) AS dist_s
      FROM znorm a JOIN znorm b
        ON abs(a.start - b.start) >= {_MP_W}
    ),
    profile AS (
      SELECT sa AS start, MIN(dist_s) AS nn_s FROM dists GROUP BY sa
    )
    SELECT start,
           round(nn_s * 1.0 / {_MP_SCALE}, 6) AS nn_dist,
           nn_s = (SELECT MIN(nn_s) FROM profile) AS is_motif,
           nn_s = (SELECT MAX(nn_s) FROM profile) AS is_discord
    FROM profile
    ORDER BY start
    """,
)
def q_matrix_profile(spark, sf_dir):
    """R403 — matrix profile (lite) of the daily counts, window
    w={w}: every subsequence's z-normalized Euclidean distance to its
    nearest NON-OVERLAPPING neighbor (|Δstart| ≥ w — the trivial-match
    exclusion that makes the profile meaningful). The profile minimum
    marks the MOTIF pair (the repeated weekly shape), the maximum the
    DISCORD (the week nothing else resembles) — both flagged.
    Subsequences and z-norms are per-row fixed-order folds over the
    bounded calendar array; pair distances integer-scale before the
    min/max. The UCR matrix-profile idea at the grain a 30-day corpus
    supports; at scale the window set is still calendar-bounded while
    the counts aggregate from the full corpus.""".format(w=_MP_W)
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy((F.dayofmonth("ts") - 1).alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mx = daily.agg(F.max("d").alias("mx"))
    grid = mx.select(
        F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("d")
    )
    series = grid.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    arr = series.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "c"))),
            lambda s: s.c.cast("double"),
        ).alias("cs"),
        F.count(F.lit(1)).alias("n"),
    )
    starts = arr.select(
        "cs",
        F.explode(
            F.sequence(F.lit(0), F.col("n").cast("int") - _MP_W)
        ).alias("start"),
    )
    w_arr = F.slice("cs", F.col("start") + 1, _MP_W)
    mean = F.aggregate(w_arr, F.lit(0.0), lambda a, b: a + b) / _MP_W
    var = (
        F.aggregate(
            F.transform(w_arr, lambda x: (x - mean) * (x - mean)),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        / _MP_W
    )
    z = F.transform(
        w_arr, lambda x: (x - mean) / F.greatest(F.sqrt(var), F.lit(1e-9))
    )
    znorm = starts.select("start", z.alias("z"))
    a = znorm.select(F.col("start").alias("sa"), F.col("z").alias("za"))
    b = znorm.select(F.col("start").alias("sb"), F.col("z").alias("zb"))
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("za"), F.col("zb"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            )
        )
        * _MP_SCALE
    ).cast("long")
    dists = a.join(
        b, F.abs(F.col("sa") - F.col("sb")) >= _MP_W
    ).select(F.col("sa").alias("start"), dist.alias("dist_s"))
    profile = dists.groupBy("start").agg(F.min("dist_s").alias("nn_s"))
    ext = profile.agg(
        F.min("nn_s").alias("mn"), F.max("nn_s").alias("mx")
    )
    return (
        profile.crossJoin(F.broadcast(ext))
        .select(
            "start",
            F.round(F.col("nn_s") * 1.0 / _MP_SCALE, 6).alias("nn_dist"),
            (F.col("nn_s") == F.col("mn")).alias("is_motif"),
            (F.col("nn_s") == F.col("mx")).alias("is_discord"),
        )
        .orderBy("start")
    )
