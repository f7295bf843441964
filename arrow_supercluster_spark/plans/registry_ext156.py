"""Round-6 registry additions, batch 151 — second-order spatial
structure and market concentration:

- q_ripleys_k: Ripley's K/L at four radii over the point table — the
  SECOND-order point-process statistic (q_clark_evans tests first-order
  nearest-neighbor structure; K sees structure at every scale r).
  Pair search is the bounded 3×3 cell equi-join (cell = max radius),
  never the full n² cross join; no edge correction (stated), L(r) =
  √(K/π) compared against CSR's L(r) = r — the fixture shows the
  lattice generator's small-r inhibition, then degree-scale
  aggregation.
- q_join_counts: join-count statistics for the binary latitude-band
  coloring — BB/BW/WW neighbor-pair counts within a fixed radius vs
  their expectations under random labeling (hypergeometric form). The
  categorical counterpart of q_morans_i; band neighbors share a color
  by construction, so BB overshoots chance while a shuffled coloring
  (tested) sits at 1.
- q_herfindahl: Herfindahl-Hirschman concentration of supplier revenue
  (exact integer cents): HHI = Σ share², normalized HHI, and the
  effective competitor count 1/HHI — the concentration summary behind
  q_pareto_ratio/q_gini read as "how many suppliers really matter".

At 100 TB: both spatial queries join on grid cells (bounded
fan-out, the KDBush-within shape used by the cluster engine); HHI is
one groupBy + one 1-row fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.points import SQL_POINTS, derived_points

_RK_RADII = (0.5, 1.0, 2.0, 4.0)  # degrees
_RK_CELL = 4.0  # must equal max radius: 3x3 cells cover every pair
_JC_R = 1.0  # join-count neighbor radius (degrees)


def _cells(pts, cell):
    return pts.select(
        "id", "lng", "lat", "city",
        F.floor(F.col("lng") / cell).cast("long").alias("cx"),
        F.floor(F.col("lat") / cell).cast("long").alias("cy"),
    )


def _neighbor_pairs(pts, cell):
    """Ordered point pairs (a≠b) with |d| bounded by the 3×3 cell
    neighborhood — the truncated-search shape shared with
    q_clark_evans."""
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("id").alias("a_id"), F.col("lng").alias("a_lng"),
        F.col("lat").alias("a_lat"), F.col("city").alias("a_city"),
        F.explode(offs).alias("o"), "cx", "cy",
    ).select(
        "a_id", "a_lng", "a_lat", "a_city",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = pts.select(
        F.col("id").alias("b_id"), F.col("lng").alias("b_lng"),
        F.col("lat").alias("b_lat"), F.col("city").alias("b_city"),
        F.col("cx").alias("jx"), F.col("cy").alias("jy"),
    )
    return a.join(b, ["jx", "jy"]).filter(F.col("a_id") != F.col("b_id"))


_SQL_CELL_PAIRS = f"""
    pts AS (
      SELECT id, lng, lat, city,
             CAST(floor(lng / {_RK_CELL}) AS BIGINT) AS cx,
             CAST(floor(lat / {_RK_CELL}) AS BIGINT) AS cy
      FROM ({SQL_POINTS}) WHERE lng IS NOT NULL AND lat IS NOT NULL
    ),
    pairs AS (
      SELECT a.id AS a_id, a.lat AS a_lat, b.lat AS b_lat,
             sqrt((a.lng - b.lng) * (a.lng - b.lng)
                  + (a.lat - b.lat) * (a.lat - b.lat)) AS d
      FROM pts a JOIN pts b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       AND a.id <> b.id
    )
"""


# ===========================================================================
# R446 — Ripley's K / L function
# ===========================================================================

@register(
    "q_ripleys_k",
    f"""
    WITH {_SQL_CELL_PAIRS},
    ext AS (
      SELECT (MAX(lng) - MIN(lng)) * (MAX(lat) - MIN(lat)) AS area,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts
    ),
    radii AS (
      SELECT UNNEST([{', '.join(str(r) for r in _RK_RADII)}]) AS r
    ),
    k AS (
      SELECT radii.r,
             SUM(CASE WHEN pairs.d <= radii.r THEN 1 ELSE 0 END) AS cnt
      FROM radii CROSS JOIN pairs GROUP BY radii.r
    )
    SELECT k.r,
           CAST(k.cnt AS BIGINT) AS n_pairs_within,
           round(ext.area * k.cnt / (ext.n * 1.0 * (ext.n - 1)), 6)
             AS ripley_k,
           round(sqrt(ext.area * k.cnt
                      / (ext.n * 1.0 * (ext.n - 1)) / pi()), 6)
             AS ripley_l,
           sqrt(ext.area * k.cnt / (ext.n * 1.0 * (ext.n - 1)) / pi())
             > k.r AS clustered
    FROM k CROSS JOIN ext ORDER BY k.r
    """,
)
def q_ripleys_k(spark, sf_dir):
    """R446 — Ripley's K̂(r) = A/(n(n−1))·Σ_{{i≠j}} 1[d_ij ≤ r] at
    r ∈ {radii} degrees, area = observed bbox, no edge correction
    (stated; all four radii share one bounded pair table, cell = max r
    so the 3×3 neighborhood is exhaustive). L(r) = √(K/π) against the
    CSR line L = r: the LCG point generator is lattice-like below
    ~0.4° (zero close pairs — INHIBITION, L < r), crossing to mild
    aggregation at degree scale — exactly the multi-scale signature
    K exists to expose and a first-order index like q_clark_evans
    cannot. Pair fan-out is grid-bounded — no n² join.""".format(radii=_RK_RADII)
    pts = _cells(
        derived_points(spark, sf_dir).filter(
            F.col("lng").isNotNull() & F.col("lat").isNotNull()
        ),
        _RK_CELL,
    )
    pairs = _neighbor_pairs(pts, _RK_CELL).select(
        F.sqrt(
            (F.col("a_lng") - F.col("b_lng"))
            * (F.col("a_lng") - F.col("b_lng"))
            + (F.col("a_lat") - F.col("b_lat"))
            * (F.col("a_lat") - F.col("b_lat"))
        ).alias("d")
    )
    ext = pts.agg(
        ((F.max("lng") - F.min("lng")) * (F.max("lat") - F.min("lat")))
        .alias("area"),
        F.count(F.lit(1)).alias("n"),
    )
    # r10 (guide §2.3 "aggregate before you shuffle"): the old
    # radii.crossJoin(pairs) pushed the whole pair table through the
    # BNLJ |radii| times; one pass with a conditional sum per radius
    # computes the identical integer counts, then unpivots the 1-row
    # aggregate to (r, cnt) rows.
    cnts = pairs.agg(
        *[
            F.sum(
                F.when(F.col("d") <= F.lit(float(r)), 1).otherwise(0)
            ).alias(f"c{i}")
            for i, r in enumerate(_RK_RADII)
        ]
    )
    k = cnts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(r)).alias("r"),
                        F.col(f"c{i}").alias("cnt"),
                    )
                    for i, r in enumerate(_RK_RADII)
                ]
            )
        ).alias("s")
        # empty-input parity (ADVICE r10): a global agg over ZERO pair
        # rows yields one all-NULL row, which would unpivot into one row
        # per radius with NULL cnt where the pre-r10 crossJoin form and
        # the DuckDB twin both produce zero rows — drop the NULL rows
    ).select("s.r", "s.cnt").filter(F.col("cnt").isNotNull())
    import math

    kk = F.col("area") * F.col("cnt") / (F.col("n") * 1.0 * (F.col("n") - 1))
    ll = F.sqrt(kk / math.pi)
    return (
        k.crossJoin(F.broadcast(ext))
        .select(
            "r",
            F.col("cnt").cast("long").alias("n_pairs_within"),
            F.round(kk, 6).alias("ripley_k"),
            F.round(ll, 6).alias("ripley_l"),
            (ll > F.col("r")).alias("clustered"),
        )
        .orderBy("r")
    )


# ===========================================================================
# R447 — join-count statistics
# ===========================================================================

_SQL_BLACK = "CAST(floor(lat / 10) AS BIGINT) % 2 = 0"


@register(
    "q_join_counts",
    f"""
    WITH {_SQL_CELL_PAIRS},
    near AS (
      SELECT CAST(floor(a_lat / 10) AS BIGINT) % 2 = 0 AS ca,
             CAST(floor(b_lat / 10) AS BIGINT) % 2 = 0 AS cb
      FROM pairs WHERE d <= {_JC_R}
    ),
    counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) // 2 AS j,
             CAST(SUM(CASE WHEN ca AND cb THEN 1 ELSE 0 END)
                  AS BIGINT) // 2 AS bb,
             CAST(SUM(CASE WHEN NOT ca AND NOT cb THEN 1 ELSE 0 END)
                  AS BIGINT) // 2 AS ww
      FROM near
    ),
    marg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN {_SQL_BLACK} THEN 1 ELSE 0 END)
                  AS BIGINT) AS nb
      FROM pts
    )
    SELECT marg.n AS n_points, marg.nb AS n_black,
           counts.j AS n_joins,
           counts.bb AS bb, counts.ww AS ww,
           counts.j - counts.bb - counts.ww AS bw,
           round(counts.j * marg.nb * 1.0 * (marg.nb - 1)
                 / (marg.n * 1.0 * (marg.n - 1)), 4) AS bb_expected,
           round(counts.j * 2.0 * marg.nb * (marg.n - marg.nb)
                 / (marg.n * 1.0 * (marg.n - 1)), 4) AS bw_expected,
           round(counts.bb / (counts.j * marg.nb * 1.0 * (marg.nb - 1)
                 / (marg.n * 1.0 * (marg.n - 1))), 4) AS bb_ratio
    FROM counts CROSS JOIN marg
    """,
)
def q_join_counts(spark, sf_dir):
    """R447 — join counts for the black = "even 10° latitude band"
    coloring over neighbor pairs within {r}°: observed BB/WW/BW vs the
    without-replacement expectations E[BB] = J·n_b(n_b−1)/(n(n−1)),
    E[BW] = 2J·n_b·n_w/(n(n−1)). The band coloring is spatially
    structured BY CONSTRUCTION (1°-neighbors almost always share a 10°
    band), so bb_ratio lands well above 1 while a random coloring with
    the same margin sits at 1 — both asserted in tests. Same bounded
    cell join as Ripley's K.""".format(r=_JC_R)
    pts = _cells(
        derived_points(spark, sf_dir).filter(
            F.col("lng").isNotNull() & F.col("lat").isNotNull()
        ),
        _RK_CELL,
    )
    d = F.sqrt(
        (F.col("a_lng") - F.col("b_lng"))
        * (F.col("a_lng") - F.col("b_lng"))
        + (F.col("a_lat") - F.col("b_lat"))
        * (F.col("a_lat") - F.col("b_lat"))
    )
    band = lambda c: F.floor(F.col(c) / 10).cast("long") % 2 == 0  # noqa: E731
    near = _neighbor_pairs(pts, _RK_CELL).filter(d <= _JC_R).select(
        band("a_lat").alias("ca"), band("b_lat").alias("cb")
    )
    counts = near.agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("j"),
        (
            F.sum(
                F.when(F.col("ca") & F.col("cb"), 1).otherwise(0)
            ) / 2
        ).cast("long").alias("bb"),
        (
            F.sum(
                F.when(~F.col("ca") & ~F.col("cb"), 1).otherwise(0)
            ) / 2
        ).cast("long").alias("ww"),
    )
    marg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(band("lat"), 1).otherwise(0)).cast("long").alias("nb"),
    )
    j = counts.crossJoin(F.broadcast(marg))
    bb_exp = (
        F.col("j") * F.col("nb") * 1.0 * (F.col("nb") - 1)
        / (F.col("n") * 1.0 * (F.col("n") - 1))
    )
    bw_exp = (
        F.col("j") * 2.0 * F.col("nb") * (F.col("n") - F.col("nb"))
        / (F.col("n") * 1.0 * (F.col("n") - 1))
    )
    return j.select(
        F.col("n").cast("long").alias("n_points"),
        F.col("nb").alias("n_black"),
        F.col("j").alias("n_joins"),
        "bb",
        "ww",
        (F.col("j") - F.col("bb") - F.col("ww")).alias("bw"),
        F.round(bb_exp, 4).alias("bb_expected"),
        F.round(bw_exp, 4).alias("bw_expected"),
        F.round(F.col("bb") / bb_exp, 4).alias("bb_ratio"),
    )


# ===========================================================================
# R448 — Herfindahl-Hirschman concentration index
# ===========================================================================

@register(
    "q_herfindahl",
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) AS r
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(r) AS t FROM rev
    )
    SELECT tot.n AS n_suppliers,
           round(SUM((rev.r * 1.0 / tot.t) * (rev.r * 1.0 / tot.t)), 6)
             AS hhi,
           round((SUM((rev.r * 1.0 / tot.t) * (rev.r * 1.0 / tot.t))
                  - 1.0 / tot.n) / (1 - 1.0 / tot.n), 6)
             AS hhi_normalized,
           round(1.0 / SUM((rev.r * 1.0 / tot.t)
                           * (rev.r * 1.0 / tot.t)), 4)
             AS effective_competitors
    FROM rev CROSS JOIN tot GROUP BY tot.n
    """,
)
def q_herfindahl(spark, sf_dir):
    """R448 — HHI of supplier revenue: shares from EXACT integer cents
    (revenue = Σ round(extprice·(1−disc)·100)), HHI = Σ share², the
    normalized form (HHI−1/n)/(1−1/n) ∈ [0,1], and 1/HHI as the
    effective number of competitors. One partial-aggregated groupBy +
    a broadcast total — the concentration headline next to
    q_gini/q_pareto_ratio."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("r")
    )
    tot = rev.agg(
        F.count(F.lit(1)).alias("n"), F.sum("r").alias("t")
    )
    share2 = (F.col("r") * 1.0 / F.col("t")) * (
        F.col("r") * 1.0 / F.col("t")
    )
    return (
        rev.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(F.sum(share2).alias("hhi"))
        .select(
            F.col("n").cast("long").alias("n_suppliers"),
            F.round("hhi", 6).alias("hhi"),
            F.round(
                (F.col("hhi") - 1.0 / F.col("n")) / (1 - 1.0 / F.col("n")),
                6,
            ).alias("hhi_normalized"),
            F.round(1.0 / F.col("hhi"), 4).alias("effective_competitors"),
        )
    )
