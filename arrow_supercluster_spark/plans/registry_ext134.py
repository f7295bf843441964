"""Round-5 registry additions, batch 129 — bitemporal modelling,
non-parametric trend, and directional statistics:

- q_bitemporal_asof: BITEMPORAL point-in-time query — facts carry BOTH
  a valid-time interval (when the price was true in the world) and a
  system-time interval (when the warehouse knew it), derived
  deterministically from orders; the query answers "as of valid time
  V, as KNOWN at system time S" and contrasts it with current
  knowledge. The dimension q_scd2_dim (system time only) can't
  express: late-arriving corrections change what-we-knew without
  changing what-was-true.
- q_mann_kendall: Mann-Kendall trend test on the daily event counts —
  S = Σ sign(c_j − c_i) over all day pairs, tie-corrected variance,
  and the normal-approximation z. The significance companion to
  q_theil_sen's robust slope (slope says how steep, MK says whether
  to believe it). All counts/pairs are exact integers.
- q_circular_stats: directional statistics of the event hour-of-day —
  mean direction and resultant length R̄ from integer-scaled per-row
  sin/cos sums, circular variance, and the Rayleigh z = nR̄² test for
  uniformity. Hours live on a CIRCLE: the arithmetic mean of 23:00
  and 01:00 is noon, the circular mean is midnight — the family
  linear statistics get structurally wrong.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_BT_VALID_AT = "1995-06-01"
_BT_KNOWN_AT = "1995-06-15"
_CS_SCALE = 1_000_000_000
_MK_SCALE = 1_000_000


# ===========================================================================
# R380 — bitemporal as-of query
# ===========================================================================

_SQL_BT_FACTS = """
    SELECT o_orderkey AS k,
           round(o_totalprice, 2) AS price,
           o_orderdate AS valid_from,
           o_orderdate + INTERVAL 180 DAY AS valid_to,
           o_orderdate + INTERVAL ((o_orderkey % 30)) DAY AS sys_from,
           CASE WHEN o_orderkey % 4 = 0
                THEN o_orderdate + INTERVAL ((o_orderkey % 30) + 90) DAY
                ELSE TIMESTAMP '2999-01-01' END AS sys_to
    FROM orders
"""


@register(
    "q_bitemporal_asof",
    f"""
    WITH facts AS ({_SQL_BT_FACTS}),
    known_then AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM facts
      WHERE valid_from <= TIMESTAMP '{_BT_VALID_AT}'
        AND valid_to > TIMESTAMP '{_BT_VALID_AT}'
        AND sys_from <= TIMESTAMP '{_BT_KNOWN_AT}'
        AND sys_to > TIMESTAMP '{_BT_KNOWN_AT}'
    ),
    known_now AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM facts
      WHERE valid_from <= TIMESTAMP '{_BT_VALID_AT}'
        AND valid_to > TIMESTAMP '{_BT_VALID_AT}'
        AND sys_to > TIMESTAMP '2998-01-01'
    )
    SELECT known_then.n AS n_known_then,
           round(known_then.cents / 100.0, 2) AS value_known_then,
           known_now.n AS n_known_now,
           round(known_now.cents / 100.0, 2) AS value_known_now,
           CAST(known_now.n - known_then.n AS BIGINT) AS restatement_rows
    FROM known_then CROSS JOIN known_now
    """,
)
def q_bitemporal_asof(spark, sf_dir):
    """R380 — bitemporal as-of: facts carry (valid_from, valid_to] in
    WORLD time and (sys_from, sys_to] in WAREHOUSE time (derived
    deterministically: records become known orderkey%30 days after
    their valid start; every 4th is later retracted). The report
    values valid time {v} twice — as KNOWN at {s}, and as known NOW —
    and the difference is the restatement the late/retracted records
    caused. Two interval-predicate scans + exact cent sums; at 100 TB
    both predicates push to the scan and the sys-time axis is what
    lets an audit reproduce last quarter's numbers EXACTLY as they
    were reported. Completes the temporal set: SCD2 (system time),
    q_temporal_split (event time), bitemporal (both).""".format(
        v=_BT_VALID_AT, s=_BT_KNOWN_AT
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    facts = o.select(
        F.round("o_totalprice", 2).alias("price"),
        F.col("o_orderdate").alias("valid_from"),
        F.date_add(F.col("o_orderdate").cast("date"), 180)
        .cast("timestamp")
        .alias("valid_to"),
        F.expr("o_orderdate + make_interval(0,0,0, CAST(o_orderkey % 30 AS INT))")
        .alias("sys_from"),
        F.when(
            F.col("o_orderkey") % 4 == 0,
            F.expr(
                "o_orderdate + make_interval(0,0,0, CAST(o_orderkey % 30 AS INT) + 90)"
            ),
        )
        .otherwise(F.lit("2999-01-01").cast("timestamp"))
        .alias("sys_to"),
    )
    v = F.lit(_BT_VALID_AT).cast("timestamp")
    s = F.lit(_BT_KNOWN_AT).cast("timestamp")
    cents = F.round(F.col("price") * 100).cast("long")
    then = facts.filter(
        (F.col("valid_from") <= v)
        & (F.col("valid_to") > v)
        & (F.col("sys_from") <= s)
        & (F.col("sys_to") > s)
    ).agg(
        F.count(F.lit(1)).alias("n_then"),
        F.sum(cents).alias("c_then"),
    )
    now = facts.filter(
        (F.col("valid_from") <= v)
        & (F.col("valid_to") > v)
        & (F.col("sys_to") > F.lit("2998-01-01").cast("timestamp"))
    ).agg(
        F.count(F.lit(1)).alias("n_now"),
        F.sum(cents).alias("c_now"),
    )
    return then.crossJoin(F.broadcast(now)).select(
        F.col("n_then").alias("n_known_then"),
        F.round(F.col("c_then") / 100.0, 2).alias("value_known_then"),
        F.col("n_now").alias("n_known_now"),
        F.round(F.col("c_now") / 100.0, 2).alias("value_known_now"),
        (F.col("n_now") - F.col("n_then")).cast("long").alias(
            "restatement_rows"
        ),
    )


# ===========================================================================
# R381 — Mann-Kendall trend test
# ===========================================================================

@register(
    "q_mann_kendall",
    """
    WITH daily AS (
      SELECT CAST(strftime(ts, '%d') AS INTEGER) AS d,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN b.c > a.c THEN 1
                  WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    s AS (SELECT CAST(SUM(sgn) AS BIGINT) AS s_stat FROM pairs),
    nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    ties AS (
      SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT COUNT(*) AS t FROM daily GROUP BY c)
    )
    SELECT s.s_stat, nrow.n,
           round((nrow.n * (nrow.n - 1) * (2 * nrow.n + 5)
                  - ties.tie_term) / 18.0, 4) AS var_s,
           round(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                      WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                      ELSE 0 END
                 / sqrt((nrow.n * (nrow.n - 1) * (2 * nrow.n + 5)
                         - ties.tie_term) / 18.0), 4) AS z,
           (s.s_stat > 0) AS increasing
    FROM s CROSS JOIN nrow CROSS JOIN ties
    """,
)
def q_mann_kendall(spark, sf_dir):
    """R381 — Mann-Kendall trend test on the daily counts: S =
    Σ_{i<j} sign(c_j − c_i) (an exact integer over the bounded
    C(days, 2) pair frame), variance with the standard tie correction
    Σt(t−1)(2t+5)/18, and the continuity-corrected z. The
    distribution-free "is there a monotone trend" answer that pairs
    with q_theil_sen's robust slope — slope magnitude without MK
    significance is how dashboards hallucinate trends. One self-join
    over ≤31 rows + closed form."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    pairs = a.join(b, F.col("db") > F.col("da")).select(
        F.when(F.col("cb") > F.col("ca"), 1)
        .when(F.col("cb") < F.col("ca"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    s = pairs.agg(F.sum("sgn").cast("long").alias("s_stat"))
    nrow = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("c")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / 18.0
    z = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    ) / F.sqrt(var_s)
    return (
        s.crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(ties))
        .select(
            "s_stat",
            "n",
            F.round(var_s, 4).alias("var_s"),
            F.round(z, 4).alias("z"),
            (F.col("s_stat") > 0).alias("increasing"),
        )
    )


# ===========================================================================
# R382 — circular statistics of hour-of-day
# ===========================================================================

@register(
    "q_circular_stats",
    f"""
    WITH hours AS (
      SELECT event_type,
             CAST(strftime(ts, '%H') AS INTEGER) AS h
      FROM events
    ),
    comps AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(round(cos(2 * pi() * h / 24.0) * {_CS_SCALE})
                      AS BIGINT)) AS cs,
             SUM(CAST(round(sin(2 * pi() * h / 24.0) * {_CS_SCALE})
                      AS BIGINT)) AS ss
      FROM hours GROUP BY event_type
    )
    SELECT event_type, n,
           round((atan2(ss * 1.0, cs * 1.0) * 24.0 / (2 * pi()) + 24.0)
                 % 24.0, 4) AS mean_hour,
           round(sqrt(cs * 1.0 * cs + ss * 1.0 * ss)
                 / ({_CS_SCALE} * 1.0 * n), 6) AS resultant_r,
           round(1.0 - sqrt(cs * 1.0 * cs + ss * 1.0 * ss)
                 / ({_CS_SCALE} * 1.0 * n), 6) AS circ_variance,
           round(n * pow(sqrt(cs * 1.0 * cs + ss * 1.0 * ss)
                 / ({_CS_SCALE} * 1.0 * n), 2), 4) AS rayleigh_z
    FROM comps
    ORDER BY event_type
    """,
)
def q_circular_stats(spark, sf_dir):
    """R382 — circular statistics of the event hour-of-day per type:
    angles θ = 2πh/24, mean direction from atan2(Σsin, Σcos) mapped
    back to hours, resultant length R̄ (1 = all at one hour, 0 =
    uniform), circular variance 1 − R̄, and the Rayleigh z = nR̄²
    uniformity test. The per-row sin/cos land on only 24 distinct
    values and are INTEGER-scaled before summing (order-free exact
    sums; atan2/sqrt then run on identical integers in both engines).
    Directional data breaks linear statistics — mean(23h, 1h) = 12h
    linearly but midnight circularly; this family answers
    when-does-traffic-peak correctly. One keyed agg."""
    ev = read_events(spark, sf_dir)
    theta = 2 * 3.141592653589793 * F.hour("ts") / 24.0
    comps = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.cos(theta) * _CS_SCALE).cast("long")).alias("cs"),
        F.sum(F.round(F.sin(theta) * _CS_SCALE).cast("long")).alias("ss"),
    )
    r_len = F.sqrt(
        F.col("cs") * 1.0 * F.col("cs") + F.col("ss") * 1.0 * F.col("ss")
    ) / (_CS_SCALE * 1.0 * F.col("n"))
    mean_hour = (
        F.atan2(F.col("ss") * 1.0, F.col("cs") * 1.0)
        * 24.0
        / (2 * 3.141592653589793)
        + 24.0
    ) % 24.0
    return comps.select(
        "event_type",
        "n",
        F.round(mean_hour, 4).alias("mean_hour"),
        F.round(r_len, 6).alias("resultant_r"),
        F.round(1.0 - r_len, 6).alias("circ_variance"),
        F.round(F.col("n") * F.pow(r_len, 2), 4).alias("rayleigh_z"),
    ).orderBy("event_type")
