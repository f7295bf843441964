"""Round-5 registry additions, batch 128 — privacy-family completion
and forecaster selection:

- q_t_closeness: t-closeness audit over the (mktsegment, nation)
  quasi-identifier classes (the same QI as q_k_anonymity /
  q_l_diversity — this completes the anonymity triad): per class, the
  Earth-Mover distance between its account-balance DECILE distribution
  and the global one, on the ordered-bin EMD closed form — assembled
  entirely in integers on the common denominator n_class·n_global
  (the q_wasserstein_1d construction applied per group). t = the max
  class EMD; homogeneous-looking classes that still skew rich or poor
  are exactly what l-diversity misses.
- q_forecast_backtest: rolling-origin one-step backtest of three
  forecasters over the daily event counts — naive (yesterday),
  seasonal-naive (same weekday last week), and EWMA (α=0.3, the
  recursive fold over the PRIOR days only — no leakage) — with MAE
  and MAPE per method and the winner flagged. The harness answers
  "which forecaster earns production" instead of assuming one; counts
  are integers, EWMA states are integer-scaled, so every error is
  exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_TC_BINS = 10
_FB_ALPHA = 0.3
_FB_SCALE = 1_000_000


# ===========================================================================
# R378 — t-closeness audit
# ===========================================================================

@register(
    "q_t_closeness",
    f"""
    WITH base AS (
      SELECT c.c_mktsegment AS seg, n.n_name AS nation,
             CAST(ntile({_TC_BINS}) OVER (ORDER BY c.c_acctbal, c.c_custkey)
                  AS INTEGER) AS bin
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    class_bins AS (
      SELECT seg, nation, bin, CAST(COUNT(*) AS BIGINT) AS cn
      FROM base GROUP BY 1, 2, 3
    ),
    class_tot AS (
      SELECT seg, nation, SUM(cn) AS nc FROM class_bins GROUP BY 1, 2
    ),
    glob_bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS gn FROM base GROUP BY bin
    ),
    glob_tot AS (SELECT SUM(gn) AS ng FROM glob_bins),
    grid AS (
      SELECT ct.seg, ct.nation, ct.nc, gb.bin, gb.gn,
             coalesce(cb.cn, 0) AS cn
      FROM class_tot ct CROSS JOIN glob_bins gb
      LEFT JOIN class_bins cb
        ON cb.seg = ct.seg AND cb.nation = ct.nation AND cb.bin = gb.bin
    ),
    cums AS (
      SELECT seg, nation, nc, bin,
             SUM(cn) OVER (PARTITION BY seg, nation ORDER BY bin) AS cum_c,
             SUM(gn) OVER (PARTITION BY seg, nation ORDER BY bin) AS cum_g
      FROM grid
    ),
    emd AS (
      SELECT cums.seg, cums.nation, cums.nc,
             SUM(abs(cum_c * gt.ng - cum_g * cums.nc)) AS gap_s
      FROM cums CROSS JOIN glob_tot gt
      WHERE bin < {_TC_BINS}
      GROUP BY cums.seg, cums.nation, cums.nc, gt.ng
    ),
    scored AS (
      SELECT seg, nation, CAST(nc AS BIGINT) AS class_size,
             round(gap_s * 1.0
                   / (nc * (SELECT ng FROM glob_tot) * ({_TC_BINS} - 1)),
                   6) AS emd
      FROM emd
    )
    SELECT seg, nation, class_size, emd,
           round((SELECT MAX(emd) FROM scored), 6) AS t_value
    FROM scored
    ORDER BY emd DESC, seg, nation
    LIMIT 10
    """,
)
def q_t_closeness(spark, sf_dir):
    """R378 — t-closeness over the (mktsegment, nation) QI classes:
    per class, the ordered-bin EMD between its balance-decile
    distribution and the global one — EMD = Σ|F_c − F_g| / (bins−1)
    with the CDF gap on the integer common denominator n_c·n_g (the
    q_wasserstein_1d construction per group; cumulative windows
    partition by class over exactly {b} bins). t = max class EMD,
    stapled to the 10 worst classes. Completes the anonymity triad:
    k-anonymity bounds class SIZE, l-diversity bounds sensitive
    CARDINALITY, t-closeness bounds sensitive DISTRIBUTION — a class
    can pass both and still leak 'this class is rich'.""".format(
        b=_TC_BINS
    )
    from pyspark.sql import Window

    from arrow_supercluster_spark.functions import distrank
    from arrow_supercluster_spark.sources.tables import read_table

    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    joined = cust.join(
        nation, cust["c_nationkey"] == nation["n_nationkey"]
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("n_name").alias("nation"),
        "c_acctbal",
        "c_custkey",
    )
    ranked, n_rows, _ = distrank.zip_scan(
        joined, ["c_acctbal", "c_custkey"], out="rk"
    )
    base = ranked.select(
        "seg",
        "nation",
        distrank.ntile_bucket(F.col("rk"), int(n_rows), _TC_BINS).alias(
            "bin"
        ),
    )
    class_bins = base.groupBy("seg", "nation", "bin").agg(
        F.count(F.lit(1)).alias("cn")
    )
    class_tot = class_bins.groupBy("seg", "nation").agg(
        F.sum("cn").alias("nc")
    )
    glob_bins = base.groupBy("bin").agg(F.count(F.lit(1)).alias("gn"))
    ng = int(n_rows)
    grid = (
        class_tot.crossJoin(F.broadcast(glob_bins))
        .join(class_bins, ["seg", "nation", "bin"], "left")
        .select(
            "seg",
            "nation",
            "nc",
            "bin",
            "gn",
            F.coalesce("cn", F.lit(0)).alias("cn"),
        )
    )
    w = Window.partitionBy("seg", "nation").orderBy("bin")
    cums = grid.select(
        "seg",
        "nation",
        "nc",
        "bin",
        F.sum("cn").over(w).alias("cum_c"),
        F.sum("gn").over(w).alias("cum_g"),
    )
    emd = (
        cums.filter(F.col("bin") < _TC_BINS)
        .groupBy("seg", "nation", "nc")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_c") * ng - F.col("cum_g") * F.col("nc")
                )
            ).alias("gap_s")
        )
    )
    scored = emd.select(
        "seg",
        "nation",
        F.col("nc").cast("long").alias("class_size"),
        F.round(
            F.col("gap_s") * 1.0 / (F.col("nc") * ng * (_TC_BINS - 1)), 6
        ).alias("emd"),
    )
    tmax = scored.agg(F.round(F.max("emd"), 6).alias("t_value"))
    return (
        scored.crossJoin(F.broadcast(tmax))
        .orderBy(F.col("emd").desc(), "seg", "nation")
        .limit(10)
    )


# ===========================================================================
# R379 — rolling-origin forecast backtest
# ===========================================================================

@register(
    "q_forecast_backtest",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    series AS (
      SELECT g.d, coalesce(daily.c, 0) AS c
      FROM (SELECT unnest(range(1, 31)) AS d) g
      LEFT JOIN daily ON g.d = daily.d
    ),
    arr AS (SELECT list(c ORDER BY d) AS cs FROM series),
    ewma AS (
      -- one-step-ahead EWMA: state after day k predicts day k+1;
      -- integer-scaled state, fold over the PRIOR days only
      SELECT d,
             CASE WHEN d = 1 THEN NULL
                  ELSE list_reduce(
                         list_transform(range(1, d),
                                        i -> CAST(arr.cs[i] AS DOUBLE)),
                         (acc, x) -> round(((1.0 - {_FB_ALPHA}) * acc
                                            + {_FB_ALPHA} * x)
                                           * {_FB_SCALE})
                                     / {_FB_SCALE}) END AS pred
      FROM series CROSS JOIN arr
    ),
    preds AS (
      SELECT s.d, s.c,
             'naive' AS method,
             (SELECT c FROM series p WHERE p.d = s.d - 1) AS pred
      FROM series s WHERE s.d >= 8 AND s.c > 0
      UNION ALL
      SELECT s.d, s.c, 'seasonal_naive',
             (SELECT c FROM series p WHERE p.d = s.d - 7)
      FROM series s WHERE s.d >= 8 AND s.c > 0
      UNION ALL
      SELECT s.d, s.c, 'ewma',
             CAST(round(e.pred * {_FB_SCALE}) AS BIGINT) * 1.0 / {_FB_SCALE}
      FROM series s JOIN ewma e ON e.d = s.d
      WHERE s.d >= 8 AND s.c > 0
    ),
    errs AS (
      SELECT method,
             SUM(CAST(round(abs(c - pred) * {_FB_SCALE}) AS BIGINT))
               AS ae_s,
             SUM(CAST(round(abs(c - pred) / c * {_FB_SCALE}) AS BIGINT))
               AS ape_s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM preds GROUP BY method
    ),
    scored AS (
      SELECT method, n,
             round(ae_s * 1.0 / ({_FB_SCALE} * 1.0 * n), 4) AS mae,
             round(ape_s * 1.0 / ({_FB_SCALE} * 1.0 * n), 6) AS mape,
             ae_s
      FROM errs
    )
    SELECT method, n, mae, mape,
           ae_s = (SELECT MIN(ae_s) FROM scored) AS best
    FROM scored
    ORDER BY method
    """,
)
def q_forecast_backtest(spark, sf_dir):
    """R379 — rolling-origin one-step backtest over the daily counts
    (evaluation days 8-30 with non-zero actuals, so every method has
    full history and MAPE is defined): naive
    (ŷ_t = y_{{t−1}}), seasonal-naive (ŷ_t = y_{{t−7}}), and EWMA
    (α={a}, state folded over days < t ONLY — the no-leakage
    discipline that separates a backtest from a fit). MAE/MAPE per
    method from integer-scaled absolute errors; the argmin is flagged.
    Forecasters must EARN deployment through this harness — the
    model-selection step q_holt_linear/q_ema_daily assume away. One
    30-row series; everything is calendar-bounded.""".format(
        a=_FB_ALPHA
    )
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = spark.range(1, 31).select(F.col("id").alias("d"))
    series = grid.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).alias("c")
    )
    arr = series.agg(
        F.array_sort(
            F.collect_list(F.struct("d", "c"))
        ).alias("sc")
    ).select(F.transform("sc", lambda s: s.c).alias("cs"))
    with_arr = series.crossJoin(F.broadcast(arr))
    # list_reduce seeds with the FIRST element (day 1) then folds the
    # rest — mirror with slice(cs, 2, d-2) (empty at d=2) + that seed
    ewma_pred = F.when(
        F.col("d") == 1, F.lit(None).cast("double")
    ).otherwise(
        F.aggregate(
            F.transform(
                F.slice("cs", 2, (F.col("d") - 2).cast("int")),
                lambda x: x.cast("double"),
            ),
            F.element_at("cs", 1).cast("double"),
            lambda acc, x: F.round(
                ((1.0 - _FB_ALPHA) * acc + _FB_ALPHA * x) * _FB_SCALE
            )
            / _FB_SCALE,
        )
    )
    eligible = with_arr.filter((F.col("d") >= 8) & (F.col("c") > 0))
    naive = eligible.select(
        "d",
        "c",
        F.lit("naive").alias("method"),
        F.element_at("cs", (F.col("d") - 1).cast("int"))
        .cast("double")
        .alias("pred"),
    )
    seas = eligible.select(
        "d",
        "c",
        F.lit("seasonal_naive").alias("method"),
        F.element_at("cs", (F.col("d") - 7).cast("int"))
        .cast("double")
        .alias("pred"),
    )
    ew = eligible.select(
        "d",
        "c",
        F.lit("ewma").alias("method"),
        ewma_pred.alias("pred"),
    )
    preds = naive.unionByName(seas).unionByName(ew)
    errs = preds.groupBy("method").agg(
        F.sum(
            F.round(F.abs(F.col("c") - F.col("pred")) * _FB_SCALE).cast(
                "long"
            )
        ).alias("ae_s"),
        F.sum(
            F.round(
                F.abs(F.col("c") - F.col("pred")) / F.col("c") * _FB_SCALE
            ).cast("long")
        ).alias("ape_s"),
        F.count(F.lit(1)).alias("n"),
    )
    best = errs.agg(F.min("ae_s").alias("best_s"))
    return (
        errs.crossJoin(F.broadcast(best))
        .select(
            "method",
            "n",
            F.round(
                F.col("ae_s") * 1.0 / (_FB_SCALE * 1.0 * F.col("n")), 4
            ).alias("mae"),
            F.round(
                F.col("ape_s") * 1.0 / (_FB_SCALE * 1.0 * F.col("n")), 6
            ).alias("mape"),
            (F.col("ae_s") == F.col("best_s")).alias("best"),
        )
        .orderBy("method")
    )
