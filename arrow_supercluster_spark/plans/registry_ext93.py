"""Round-4 registry additions, batch 88 — the attribution family
completed, plus business-day arithmetic:

- q_multitouch: position-based (U-shaped) multi-touch attribution —
  40% first touch, 40% last, 20% split across the middle of each
  converting user's pre-purchase journey. Complements R69's last-touch
  interval join; windows partition by user.
- q_business_days: order → first-ship lead time in BUSINESS days via
  pure epoch-day arithmetic (5·⌊Δ/7⌋ + a wrap-aware remainder count;
  both engines evaluate the IDENTICAL integer expression — no reliance
  on either engine's dow() convention, which disagree: Spark dayofweek
  is 1=Sunday, DuckDB isodow is 1=Monday).
- q_markov_attribution: Markov removal-effect attribution (the
  data-driven alternative to heuristic credit): journeys become a
  first-order chain with START/CONV/NULL absorbing structure; each
  channel's effect = 1 - P(conv with the channel's transitions
  redirected to NULL)/P(conv). Transition counts collapse
  distributed; the |channels|² matrix is solved on the driver with
  numpy (broadcast scale). Rows-only: an absorbing-chain solve has no
  SQL form; tests pin hand-enumerable journeys.

At 100 TB: attribution windows are user-bounded; the Markov chain's
distributed footprint is one pair-count agg regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events


@register(
    "q_multitouch",
    """
    WITH firstp AS (
      SELECT user_id, MIN(ts) AS pts FROM events
      WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id
      FROM events e JOIN firstp f ON f.user_id = e.user_id
      WHERE e.ts < f.pts AND e.event_type <> 'purchase'
    ),
    ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM touches
    ),
    credit AS (
      SELECT event_type,
             CASE WHEN n = 1 THEN 1.0
                  WHEN n = 2 THEN 0.5
                  WHEN rn = 1 OR rn = n THEN 0.4
                  ELSE 0.2 / (n - 2) END AS c
      FROM ranked
    )
    SELECT event_type, ROUND(SUM(c), 6) AS credit,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM credit GROUP BY event_type
    """,
)
def q_multitouch(spark, sf_dir):
    """U-shaped attribution: each converting user's strictly-pre-first-
    purchase touch sequence gets 40/20/40 position credit (1 touch →
    100%, 2 → 50/50). All windows partition by user (bounded); the
    credit rollup is one narrow agg per channel."""
    ev = read_events(spark, sf_dir)
    firstp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    touches = (
        ev.join(firstp, "user_id")
        .filter((F.col("ts") < F.col("pts")) & (F.col("event_type") != "purchase"))
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = touches.select(
        "user_id", "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    c = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 0.4)
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return ranked.select("event_type", c.alias("c")).groupBy("event_type").agg(
        F.round(F.sum("c"), 6).alias("credit"),
        F.count(F.lit(1)).alias("n_touches"),
    )


# business-day count over epoch days n in (n1, n2]: day-of-week index
# (n + 3) % 7 maps 0=Monday (1970-01-01 = day 0 = Thursday = index 3),
# so indices 0..4 are weekdays; (n1 + 4) % 7 below is the index of the
# FIRST counted day n1+1. 5 per full week + a wrap-aware remainder
# count. Pure integer arithmetic — the SAME expression on both
# engines, no dow() builtin (their week-start conventions disagree).
_SQL_BUS = """
    5 * ((n2 - n1) // 7)
    + GREATEST(LEAST(((n1 + 4) % 7) + ((n2 - n1) % 7), 5)
               - ((n1 + 4) % 7), 0)
    + GREATEST(LEAST(((n1 + 4) % 7) + ((n2 - n1) % 7) - 7, 5), 0)
"""


@register(
    "q_business_days",
    f"""
    WITH ship AS (
      SELECT l_orderkey, MIN(l_shipdate) AS first_ship FROM lineitem
      GROUP BY l_orderkey
    ),
    leadt AS (
      SELECT o.o_orderpriority AS priority,
             CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'
                  AS BIGINT) AS n1,
             CAST(CAST(s.first_ship AS DATE) - DATE '1970-01-01'
                  AS BIGINT) AS n2
      FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
    ),
    b AS (
      SELECT priority, CAST({_SQL_BUS} AS BIGINT) AS bus FROM leadt
      WHERE n2 >= n1
    )
    SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(AVG(bus), 4) AS avg_bus_days,
           CAST(MAX(bus) AS BIGINT) AS max_bus_days
    FROM b GROUP BY priority
    """,
)
def q_business_days(spark, sf_dir):
    """Business-day lead time (order → first ship) per priority. The
    weekday count is closed-form integer arithmetic on epoch-day
    numbers: 5 per full week plus a wrap-aware remainder count keyed on
    the (n+3)%7 0=Monday index; identical expressions both engines, so neither
    side's day-of-week builtin (they disagree on week start) is
    involved. The calendar-day twin is q_ship_lead_time."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    ship = li.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    # epoch-DAY numbers via calendar-date diff — timezone-free on both
    # engines (TIMESTAMP_NTZ has no epoch and no long cast)
    epoch_date = F.lit("1970-01-01").cast("date")
    leadt = o.join(ship, o.o_orderkey == ship.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("o_orderdate"), epoch_date)
        .cast("long")
        .alias("n1"),
        F.datediff(F.to_date("first_ship"), epoch_date)
        .cast("long")
        .alias("n2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    start = (n1 + 4) % 7
    rem = (n2 - n1) % 7
    bus = (
        5 * F.floor((n2 - n1) / 7)
        + F.greatest(F.least(start + rem, F.lit(5)) - start, F.lit(0))
        + F.greatest(F.least(start + rem - 7, F.lit(5)), F.lit(0))
    )
    return (
        leadt.filter(n2 >= n1)
        .select("priority", bus.cast("long").alias("bus"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("bus"), 4).alias("avg_bus_days"),
            F.max("bus").cast("long").alias("max_bus_days"),
        )
    )


_MA_DOUBLINGS = 12  # same truncation bound as q_absorbing_markov's twin


def _markov_attribution_sql(doublings: int = _MA_DOUBLINGS) -> str:
    """Generate the bounded-unroll twin (VERDICT r7 "Next round" #5 —
    'the q_markov_attribution pattern blocks on the same shape' as the
    R454 solve, now unblocked): ONE variant-keyed doubling-truncated
    Neumann series computes the absorption probability for the base
    chain AND every channel-removal chain simultaneously — the removal
    variants become an `excl` key column on the (a, b, v) cell
    relation, so the 12 doublings stay 12 join-aggregates regardless of
    channel count.  Removal semantics mirror the numpy path exactly:
    into-channel transitions redirect to NULL, the channel's own row
    drops, rows re-normalize per variant."""
    parts = [
        """
    WITH firstp AS MATERIALIZED (
      SELECT user_id, MIN(ts) AS pts FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ),
    journey AS MATERIALIZED (
      SELECT e.user_id, e.ts, e.event_id, e.event_type,
             f.pts IS NOT NULL AS converted
      FROM events e LEFT JOIN firstp f ON f.user_id = e.user_id
      WHERE f.pts IS NULL
         OR (e.ts < f.pts AND e.event_type <> 'purchase')
    ),
    seq AS MATERIALIZED (
      SELECT user_id, event_type AS cur,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n,
             converted
      FROM journey
    ),
    trans_raw AS MATERIALIZED (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT 'START' AS a, cur AS b FROM seq WHERE rn = 1
        UNION ALL
        SELECT prev AS a, cur AS b FROM seq WHERE prev IS NOT NULL
        UNION ALL
        SELECT cur AS a,
               CASE WHEN converted THEN 'CONV' ELSE 'NULL' END AS b
        FROM seq WHERE rn = n
      ) GROUP BY 1, 2
    ),
    channels AS MATERIALIZED (
      SELECT DISTINCT ch FROM (
        SELECT a AS ch FROM trans_raw WHERE a <> 'START'
        UNION
        SELECT b AS ch FROM trans_raw WHERE b NOT IN ('CONV', 'NULL')
      )
    ),
    variants AS MATERIALIZED (
      SELECT '__BASE__' AS excl UNION ALL SELECT ch FROM channels
    ),
    redirected AS MATERIALIZED (
      SELECT v.excl, t.a,
             CASE WHEN t.b = v.excl THEN 'NULL' ELSE t.b END AS b,
             SUM(t.c) AS c
      FROM trans_raw t CROSS JOIN variants v
      WHERE t.a <> v.excl
      GROUP BY 1, 2, 3
    ),
    tot AS MATERIALIZED (
      SELECT excl, a, SUM(c) AS t FROM redirected GROUP BY 1, 2
    ),
    qv AS MATERIALIZED (
      SELECT r.excl, r.a, r.b, r.c * 1.0 / tot.t AS v
      FROM redirected r
      JOIN tot ON tot.excl = r.excl AND tot.a = r.a
      WHERE r.b NOT IN ('CONV', 'NULL')
    ),
    rv AS MATERIALIZED (
      SELECT r.excl, r.a, r.b, r.c * 1.0 / tot.t AS v
      FROM redirected r
      JOIN tot ON tot.excl = r.excl AND tot.a = r.a
      WHERE r.b IN ('CONV', 'NULL')
    ),
    s0 AS MATERIALIZED (SELECT excl, a, a AS b, 1.0 AS v FROM tot),
    p0 AS MATERIALIZED (SELECT excl, a, b, v FROM qv)"""
    ]
    for k in range(1, doublings + 1):
        parts.append(f""",
    s{k} AS MATERIALIZED (
      SELECT excl, a, b, SUM(v) AS v FROM (
        SELECT excl, a, b, v FROM s{k - 1}
        UNION ALL
        SELECT p.excl, p.a, s.b, p.v * s.v AS v
        FROM p{k - 1} p
        JOIN s{k - 1} s ON s.excl = p.excl AND s.a = p.b
      ) GROUP BY 1, 2, 3
    ),
    p{k} AS MATERIALIZED (
      SELECT x.excl, x.a, y.b, SUM(x.v * y.v) AS v
      FROM p{k - 1} x
      JOIN p{k - 1} y ON y.excl = x.excl AND y.a = x.b
      GROUP BY 1, 2, 3
    )""")
    parts.append(f""",
    pconv AS MATERIALIZED (
      SELECT s.excl, SUM(s.v * r.v) AS pc
      FROM s{doublings} s
      JOIN rv r ON r.excl = s.excl AND r.a = s.b AND r.b = 'CONV'
      WHERE s.a = 'START'
      GROUP BY 1
    ),
    base AS MATERIALIZED (
      SELECT COALESCE((SELECT pc FROM pconv WHERE excl = '__BASE__'), 0.0)
        AS bpc
    ),
    eff AS MATERIALIZED (
      SELECT c.ch,
             CASE WHEN base.bpc > 0
                  THEN GREATEST(0.0, 1.0 - COALESCE(p.pc, 0.0) / base.bpc)
                  ELSE 1.0 END AS e
      FROM channels c
      LEFT JOIN pconv p ON p.excl = c.ch
      CROSS JOIN base
    )
    SELECT ch AS channel, round(e, 6) AS removal_effect,
           round(CASE WHEN te.t > 0 THEN e / te.t ELSE 0.0 END, 6) AS share
    FROM eff CROSS JOIN (SELECT SUM(e) AS t FROM eff) te
    ORDER BY channel
    """)
    return "".join(parts)


@register("q_markov_attribution", _markov_attribution_sql())
def q_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution. Journey = each user's
    pre-first-purchase touch sequence (converters absorb in CONV,
    non-converters in NULL); transitions include START. Channel
    effect = 1 - P(conv | channel redirected to NULL) / P(conv);
    shares normalize the effects. The transition counts collapse
    distributed (one pair agg); the absorbing solve runs on the driver
    over a |channels|+3 square matrix with numpy — broadcast-scale
    state, like the BPE/k-means driver loops. SQL twin since round 8:
    one variant-keyed 12-doubling Neumann series computes base and
    every removal chain at once (_markov_attribution_sql; truncation
    bound as in registry_ext158); tests enumerate a hand-checkable
    funnel."""
    import numpy as np

    ev = read_events(spark, sf_dir)
    firstp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )
    j = ev.join(firstp, "user_id", "left").filter(
        F.col("pts").isNull()
        | ((F.col("ts") < F.col("pts")) & (F.col("event_type") != "purchase"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = j.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lag("event_type").over(w).alias("prev"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        F.col("pts").isNotNull().alias("converted"),
    )
    starts = seq.filter(F.col("rn") == 1).select(
        F.lit("START").alias("a"), F.col("cur").alias("b")
    )
    mids = seq.filter(F.col("prev").isNotNull()).select(
        F.col("prev").alias("a"), F.col("cur").alias("b")
    )
    ends = seq.filter(F.col("rn") == F.col("n")).select(
        F.col("cur").alias("a"),
        F.when(F.col("converted"), "CONV").otherwise("NULL").alias("b"),
    )
    trans = (
        starts.unionByName(mids)
        .unionByName(ends)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    channels = sorted(
        {r.a for r in trans if r.a not in ("START",)}
        | {r.b for r in trans if r.b not in ("CONV", "NULL")}
    )
    states = ["START"] + channels + ["CONV", "NULL"]
    idx = {s: i for i, s in enumerate(states)}
    counts = np.zeros((len(states), len(states)))
    for r in trans:
        counts[idx[r.a], idx[r.b]] += r.c

    def p_conv(excluded=None):
        m = counts.copy()
        if excluded is not None:
            e = idx[excluded]
            m[:, idx["NULL"]] += m[:, e]  # redirect into-channel → NULL
            m[:, e] = 0
            m[e, :] = 0
        rows = m.sum(axis=1)
        n_abs = 2  # CONV, NULL
        nt = len(states) - n_abs
        P = np.zeros_like(m)
        for i in range(nt):
            if rows[i] > 0:
                P[i] = m[i] / rows[i]
        Q, R = P[:nt, :nt], P[:nt, nt:]
        B = np.linalg.solve(np.eye(nt) - Q, R)  # absorption probs
        return B[idx["START"], 0]  # CONV is first absorbing column

    base = p_conv()
    out = []
    total_effect = 0.0
    effects = {}
    for ch in channels:
        e = max(0.0, 1.0 - (p_conv(ch) / base if base > 0 else 0.0))
        effects[ch] = e
        total_effect += e
    for ch in channels:
        share = effects[ch] / total_effect if total_effect > 0 else 0.0
        out.append((ch, round(float(effects[ch]), 6), round(float(share), 6)))
    return spark.createDataFrame(
        out, "channel string, removal_effect double, share double"
    )
