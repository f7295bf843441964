"""Round-6 registry additions, batch 148 — interval sweep-line,
sequential drift detection, and intermittent-demand forecasting:

- q_max_concurrency: peak concurrent activity via the classic
  sweep line — every event opens a 5-minute interval, +1/−1 deltas
  sorted by (time, delta) (closes before opens at the same instant),
  running sum, global max and its first attainment time. The
  "how many sessions were live at peak" capacity question.
- q_page_hinkley: Page-Hinkley sequential drift test over the daily
  mean purchase value — cumulative deviation from the running mean
  minus tolerance δ, alarm when m_t − min_{i≤t} m_i exceeds λ. The
  ONLINE counterpart of q_cusum_changepoint (which scans with the
  global mean, i.e. needs the full series first).
- q_croston: Croston's method for the intermittent demand series
  "daily count of premium purchases (value > 200, ~p97)" — separate
  EWMA (α=0.2) of demand SIZES at demand days and of inter-demand
  INTERVALS, forecast = z/p. The standard forecast when most days
  are zero and q_holt_linear's level/trend smoothing is wrong.
  Both recursions are expanded to their closed power-weighted sums,
  so the SQL twin is exact.

At 100 TB: the sweep line shuffles once on time (the same sort the
sessionizer pays); PH and Croston collapse to ≤31 day rows first.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_MC_MINUTES = 5
_PH_DELTA = 0.5
_PH_LAMBDA = 10.0
_CR_ALPHA = 0.2
_CR_PREMIUM = 200.0


# ===========================================================================
# R437 — max concurrency (interval sweep line)
# ===========================================================================

@register(
    "q_max_concurrency",
    f"""
    WITH sweep AS (
      SELECT ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT ts + INTERVAL {_MC_MINUTES} MINUTE, -1 FROM events
    ),
    running AS (
      SELECT t, delta,
             SUM(delta) OVER (ORDER BY t, delta) AS live
      FROM sweep
    ),
    peak AS (
      SELECT MAX(live) AS max_live,
             CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_intervals
      FROM running
    )
    SELECT peak.n_intervals, CAST(peak.max_live AS BIGINT) AS max_concurrent,
           (SELECT MIN(t) FROM running WHERE live = peak.max_live)
             AS first_peak_ts
    FROM peak
    """,
)
def q_max_concurrency(spark, sf_dir):
    """R437 — sweep-line peak concurrency over 5-minute event
    intervals: +1 at open, −1 at close, closes processed first at a
    shared instant (both engines share the tie rule; with closes
    first, no intermediate state inside an instant exceeds the
    instant's final value, so the per-instant cumulative attains the
    peak). Spark side: deltas collapse per distinct instant, then the
    DISTRIBUTED zip_scan running sum — no global window (the
    window-gate scale-killer class); the oracle twin keeps the plain
    windowed form, same output. One time-ordered shuffle; no O(n²)
    overlap join."""
    from arrow_supercluster_spark.functions.distrank import zip_scan

    ev = read_events(spark, sf_dir)
    opens = ev.select(F.col("ts").alias("t"), F.lit(1).alias("delta"))
    closes = ev.select(
        (F.col("ts") + F.expr(f"INTERVAL {_MC_MINUTES} MINUTE")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    sweep = opens.unionByName(closes)
    # Collapse deltas per distinct instant FIRST: with the closes-first
    # tie rule, intermediate states inside one instant never exceed the
    # instant's final value, so the peak is attained on the per-instant
    # cumulative — which the distributed zip_scan computes without a
    # global window (the window-gate class this query must not join).
    per_t = sweep.groupBy("t").agg(F.sum("delta").alias("nd"))
    running, _, _ = zip_scan(
        per_t, ["t"], out="_i", scan_col="nd", scan_out="live"
    )
    n = ev.agg(F.count(F.lit(1)).alias("n_intervals"))
    peak = running.agg(F.max("live").alias("max_live"))
    first = (
        running.join(F.broadcast(peak), F.col("live") == F.col("max_live"))
        .agg(F.min("t").alias("first_peak_ts"))
    )
    return (
        n.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(first))
        .select(
            F.col("n_intervals").cast("long"),
            F.col("max_live").cast("long").alias("max_concurrent"),
            "first_peak_ts",
        )
    )


# ===========================================================================
# R438 — Page-Hinkley drift detection
# ===========================================================================

@register(
    "q_page_hinkley",
    f"""
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             SUM(CAST(round(value * 100) AS BIGINT)) AS s,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    x AS (
      SELECT d, s / (100.0 * c) AS x FROM daily
    ),
    dev AS (
      SELECT d, x,
             x - AVG(x) OVER (ORDER BY d) - {_PH_DELTA} AS dev
      FROM x
    ),
    m AS (
      SELECT d, x, SUM(dev) OVER (ORDER BY d) AS m_t FROM dev
    ),
    ph AS (
      SELECT d, x, m_t,
             m_t - MIN(m_t) OVER (ORDER BY d) AS ph_t
      FROM m
    )
    SELECT d, round(x, 4) AS daily_mean, round(m_t, 4) AS m_t,
           round(ph_t, 4) AS ph_t, ph_t > {_PH_LAMBDA} AS alarm
    FROM ph ORDER BY d
    """,
)
def q_page_hinkley(spark, sf_dir):
    """R438 — Page-Hinkley over the daily mean purchase value (exact
    integer cents → one division): deviations from the RUNNING mean
    minus tolerance δ={d}, cumulative m_t, PH_t = m_t − min m, alarm at
    λ={l}. Three stacked ≤31-row windows — the sequential scan shape
    every streaming drift detector reduces to in batch replay. The
    crafted-drift test injects a level shift and asserts the alarm
    fires after it, never before.""".format(d=_PH_DELTA, l=_PH_LAMBDA)
    ev = read_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    x = daily.select("d", (F.col("s") / (100.0 * F.col("c"))).alias("x"))
    w = Window.orderBy("d")
    dev = x.select(
        "d", "x", (F.col("x") - F.avg("x").over(w) - _PH_DELTA).alias("dev")
    )
    m = dev.select("d", "x", F.sum("dev").over(w).alias("m_t"))
    ph = m.select(
        "d", "x", "m_t", (F.col("m_t") - F.min("m_t").over(w)).alias("ph_t")
    )
    return ph.select(
        "d",
        F.round("x", 4).alias("daily_mean"),
        F.round("m_t", 4).alias("m_t"),
        F.round("ph_t", 4).alias("ph_t"),
        (F.col("ph_t") > _PH_LAMBDA).alias("alarm"),
    ).orderBy("d")


# ===========================================================================
# R439 — Croston's intermittent-demand forecast
# ===========================================================================

@register(
    "q_croston",
    f"""
    WITH demand AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS t,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events
      WHERE event_type = 'purchase' AND value > {_CR_PREMIUM}
      GROUP BY 1
    ),
    seq AS (
      SELECT t, y,
             ROW_NUMBER() OVER (ORDER BY t) AS k,
             t - COALESCE(LAG(t) OVER (ORDER BY t), 0) AS q
      FROM demand
    ),
    kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk FROM seq),
    z AS (
      SELECT SUM(CASE WHEN k = 1 THEN pow(1 - {_CR_ALPHA}, kk - 1) * y
                      ELSE {_CR_ALPHA} * pow(1 - {_CR_ALPHA}, kk - k) * y
                 END) AS z,
             SUM(CASE WHEN k = 1 THEN pow(1 - {_CR_ALPHA}, kk - 1) * q
                      ELSE {_CR_ALPHA} * pow(1 - {_CR_ALPHA}, kk - k) * q
                 END) AS p
      FROM seq CROSS JOIN kk
    )
    SELECT kk.kk AS n_demand_days,
           round(z.z, 4) AS smoothed_size,
           round(z.p, 4) AS smoothed_interval,
           round(z.z / z.p, 4) AS croston_forecast
    FROM kk CROSS JOIN z
    """,
)
def q_croston(spark, sf_dir):
    """R439 — Croston over the premium-purchase (value > {v}, ~p97 of the value distribution) daily demand:
    most days are zero, so level smoothing is biased; Croston EWMAs
    the demand SIZES y_k and the inter-demand INTERVALS q_k (first
    interval = first demand day, the standard init) separately at
    α={a}, forecast = z/p demand per day. Both exponential recursions
    are expanded to closed power-weighted sums — z_K = (1−α)^{{K−1}}y_1
    + αΣ(1−α)^{{K−k}}y_k — so one aggregation computes the final state
    with no sequential dependency, and the SQL twin is the identical
    expression.""".format(v=_CR_PREMIUM, a=_CR_ALPHA)
    ev = read_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & (F.col("value") > _CR_PREMIUM)
    )
    demand = ev.groupBy(F.dayofmonth("ts").alias("t")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.orderBy("t")
    seq = demand.select(
        "t",
        "y",
        F.row_number().over(w).alias("k"),
        (F.col("t") - F.coalesce(F.lag("t").over(w), F.lit(0))).alias("q"),
    )
    kk = seq.agg(F.count(F.lit(1)).alias("kk"))
    a = _CR_ALPHA
    j = seq.crossJoin(F.broadcast(kk))
    term = lambda col: F.when(  # noqa: E731
        F.col("k") == 1,
        F.pow(F.lit(1 - a), F.col("kk") - 1) * F.col(col),
    ).otherwise(
        F.lit(a) * F.pow(F.lit(1 - a), F.col("kk") - F.col("k")) * F.col(col)
    )
    z = j.agg(
        F.sum(term("y")).alias("z"),
        F.sum(term("q")).alias("p"),
        F.max("kk").alias("kk"),
    )
    return z.select(
        F.col("kk").cast("long").alias("n_demand_days"),
        F.round("z", 4).alias("smoothed_size"),
        F.round("p", 4).alias("smoothed_interval"),
        F.round(F.col("z") / F.col("p"), 4).alias("croston_forecast"),
    )
