"""Round-7 registry additions, batch 206 — multi-criteria decision
queries (the preference layer over aggregated entity scores):

- q_topsis: TOPSIS ranking of suppliers on three lineitem-derived
  criteria — revenue (benefit), mean discount (cost), shipment count
  (benefit) — with STATED weights (0.5, 0.2, 0.3) and max-normalization
  (x/max, exact rationals; the vector-norm variant would push squared
  cents past 2^53): closeness = d⁻/(d⁺ + d⁻) to the ideal /
  anti-ideal points.
- q_onion_layers: three unrolled skyline-peeling layers over parts on
  (retail price ↓ better, size ↑ better) — layer k = the Pareto
  frontier of what layers < k left behind; the classic preference
  ordering (q_skyline is layer 1 of this construction on its own
  criteria).

At 100 TB: the criteria tables are entity-level collapses (suppliers,
parts); TOPSIS is two aggregation passes over the entity frame; each
onion layer is one dominance anti-join — |entities|² worst case but
frontier-output-bounded in practice, and entity frames are dimension
tables, not the fact corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register

_TP_W = (0.5, 0.2, 0.3)  # revenue, discount(cost), shipments
_ON_LAYERS = 3

_SQL_REV_CENTS = (
    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
)


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ===========================================================================
# R614 — TOPSIS supplier ranking
# ===========================================================================

@register(
    "q_topsis",
    f"""
    WITH crit AS (
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM({_SQL_REV_CENTS}) AS BIGINT) AS rev,
             CAST(SUM(CAST(round(l_discount * 100) AS BIGINT))
                  AS BIGINT) AS disc_pct_sum,
             CAST(COUNT(*) AS BIGINT) AS n_ship
      FROM lineitem GROUP BY 1
    ),
    mx AS (
      SELECT MAX(rev) AS mrev,
             MAX(disc_pct_sum * 1.0 / n_ship) AS mdisc,
             MAX(n_ship) AS mship
      FROM crit
    ),
    normed AS (
      SELECT s_suppkey,
             rev * 1.0 / mrev AS c1,
             (disc_pct_sum * 1.0 / n_ship) / mdisc AS c2,
             n_ship * 1.0 / mship AS c3
      FROM crit CROSS JOIN mx
    ),
    ideal AS (
      SELECT MAX(c1) AS i1, MIN(c2) AS i2, MAX(c3) AS i3,
             MIN(c1) AS a1, MAX(c2) AS a2, MIN(c3) AS a3
      FROM normed
    ),
    scored AS (
      SELECT s_suppkey,
             sqrt({_TP_W[0]} * (c1 - i1) * (c1 - i1)
                + {_TP_W[1]} * (c2 - i2) * (c2 - i2)
                + {_TP_W[2]} * (c3 - i3) * (c3 - i3)) AS d_plus,
             sqrt({_TP_W[0]} * (c1 - a1) * (c1 - a1)
                + {_TP_W[1]} * (c2 - a2) * (c2 - a2)
                + {_TP_W[2]} * (c3 - a3) * (c3 - a3)) AS d_minus
      FROM normed CROSS JOIN ideal
    )
    SELECT s_suppkey,
           round(d_minus / (d_plus + d_minus), 6) AS closeness
    FROM scored
    ORDER BY closeness DESC, s_suppkey
    """,
)
def q_topsis(spark, sf_dir):
    """R614 — TOPSIS: max-normalized criteria (exact rationals),
    weighted Euclidean distances to the ideal (best of each
    criterion) and anti-ideal, closeness = d⁻/(d⁺+d⁻), ranked.
    Two entity-frame aggregation passes."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    crit = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(rev).alias("rev"),
        F.sum(
            F.round(F.col("l_discount") * 100).cast("long")
        ).alias("disc_pct_sum"),
        F.count(F.lit(1)).alias("n_ship"),
    )
    mx = crit.agg(
        F.max("rev").alias("mrev"),
        F.max(
            F.col("disc_pct_sum") * 1.0 / F.col("n_ship")
        ).alias("mdisc"),
        F.max("n_ship").alias("mship"),
    )
    normed = crit.crossJoin(F.broadcast(mx)).select(
        "s_suppkey",
        (F.col("rev") * 1.0 / F.col("mrev")).alias("c1"),
        (
            (F.col("disc_pct_sum") * 1.0 / F.col("n_ship"))
            / F.col("mdisc")
        ).alias("c2"),
        (F.col("n_ship") * 1.0 / F.col("mship")).alias("c3"),
    )
    ideal = normed.agg(
        F.max("c1").alias("i1"),
        F.min("c2").alias("i2"),
        F.max("c3").alias("i3"),
        F.min("c1").alias("a1"),
        F.max("c2").alias("a2"),
        F.min("c3").alias("a3"),
    )
    w1, w2, w3 = _TP_W
    j = normed.crossJoin(F.broadcast(ideal))
    d_plus = F.sqrt(
        w1 * (F.col("c1") - F.col("i1")) * (F.col("c1") - F.col("i1"))
        + w2 * (F.col("c2") - F.col("i2")) * (F.col("c2") - F.col("i2"))
        + w3 * (F.col("c3") - F.col("i3")) * (F.col("c3") - F.col("i3"))
    )
    d_minus = F.sqrt(
        w1 * (F.col("c1") - F.col("a1")) * (F.col("c1") - F.col("a1"))
        + w2 * (F.col("c2") - F.col("a2")) * (F.col("c2") - F.col("a2"))
        + w3 * (F.col("c3") - F.col("a3")) * (F.col("c3") - F.col("a3"))
    )
    return j.select(
        "s_suppkey",
        F.round(d_minus / (d_plus + d_minus), 6).alias("closeness"),
    ).orderBy(F.desc("closeness"), F.asc("s_suppkey"))


# ===========================================================================
# R615 — onion-layer (iterative skyline) decomposition
# ===========================================================================

def _onion_sql() -> str:
    ctes = [
        """pts0 AS (
      SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT)
               AS price, CAST(p_size AS BIGINT) AS sz
      FROM part
    )"""
    ]
    rows = []
    for k in range(1, _ON_LAYERS + 1):
        prev = f"pts{k - 1}"
        ctes.append(
            f"""sky{k} AS (
      SELECT a.p_partkey, a.price, a.sz
      FROM {prev} a
      WHERE NOT EXISTS (
        SELECT 1 FROM {prev} b
        WHERE b.price <= a.price AND b.sz >= a.sz
          AND (b.price < a.price OR b.sz > a.sz)
      )
    )"""
        )
        ctes.append(
            f"""pts{k} AS (
      SELECT p.* FROM {prev} p
      WHERE NOT EXISTS (
        SELECT 1 FROM sky{k} s WHERE s.p_partkey = p.p_partkey
      )
    )"""
        )
        rows.append(
            f"""SELECT {k} AS layer,
                 CAST(COUNT(*) AS BIGINT) AS n_parts,
                 round(MIN(price) / 100.0, 2) AS min_price,
                 CAST(MAX(sz) AS BIGINT) AS max_size
          FROM sky{k}"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + " UNION ALL ".join(rows)
        + "\n    ORDER BY layer"
    )


@register("q_onion_layers", _onion_sql())
def q_onion_layers(spark, sf_dir):
    """R615 — three unrolled Pareto-peeling layers on parts (price
    lower-better, size higher-better; strict dominance in ≥1
    criterion): layer k = skyline of the points layers < k left.
    Each layer is one dominance anti-join on the entity frame."""
    from arrow_supercluster_spark.functions.checkpoint import truncate

    pts = truncate(
        _t(spark, sf_dir, "part").select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100)
            .cast("long")
            .alias("price"),
            F.col("p_size").cast("long").alias("sz"),
        )
    )
    outs = []
    for k in range(1, _ON_LAYERS + 1):
        b = pts.select(
            F.col("p_partkey").alias("bk"),
            F.col("price").alias("bp"),
            F.col("sz").alias("bs"),
        )
        dominated = pts.join(
            b,
            (F.col("bp") <= F.col("price"))
            & (F.col("bs") >= F.col("sz"))
            & (
                (F.col("bp") < F.col("price"))
                | (F.col("bs") > F.col("sz"))
            ),
            "left_semi",
        )
        sky = pts.join(dominated, ["p_partkey"], "left_anti")
        outs.append(
            sky.agg(
                F.lit(k).alias("layer"),
                F.count(F.lit(1)).alias("n_parts"),
                F.round(F.min("price") / 100.0, 2).alias("min_price"),
                F.max("sz").alias("max_size"),
            )
        )
        pts = truncate(
            pts.join(
                sky.select("p_partkey"), ["p_partkey"], "left_anti"
            )
        )
    out = outs[0]
    for p in outs[1:]:
        out = out.unionByName(p)
    return out.orderBy("layer")
