"""Round-7 registry additions, batch 169 — storage-engine encoding
analytics (the q_theta_sketch / q_bitmap_index / q_gorilla_cost
family: the decisions a columnar writer makes, as checkable queries):

- q_dict_encoding: dictionary-encoding advisor — per catalog column,
  distinct count, ceil(log2(d)) index bits vs the plain UTF-8 bits,
  the estimated compression ratio and the keep/skip decision at the
  2× bar. The first decision every parquet/ORC writer takes.
- q_rle_stats: run-length structure of event_type in (ts, event_id)
  storage order — run count, mean/max run length, RLE-vs-plain cost.
  Adjacency comes from the distributed zip_scan rank + an idx-1
  self-join, and run ids from a second zip_scan running sum of the
  change flags — no global window anywhere in the Spark plan (the
  oracle's LAG/SUM OVER is the semantic twin only).
- q_zone_map_skips: zone-map (min/max page statistics) effectiveness
  for `value >= 150` under two physical orderings — natural event_id
  pages vs value-sorted pages. THE quantified argument for sort keys
  / z-ordering: the same data, the same predicate, and the skip rate
  goes from ~0 to ~the selectivity complement.

At 100 TB: dict stats are per-column 1-row aggs; RLE is two zip_scan
passes plus equi-joins on the rank; zone maps are two page-keyed
groupBys. Nothing funnels the corpus through one reducer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.functions.distrank import zip_scan
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_DICT_COLS = (
    ("documents", "lang"),
    ("documents", "source"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
)
_DICT_BAR = 2.0          # keep dictionary if plain/dict >= 2x
_ZM_PAGE = 200           # rows per simulated page
_ZM_THRESH = 150.0       # predicate: value >= 150


# ===========================================================================
# R504 — dictionary-encoding advisor
# ===========================================================================

_DICT_SQL = " UNION ALL ".join(
    f"""
    SELECT '{t}' AS tbl, '{c}' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           round(AVG(len({c})) * 8.0, 4) AS plain_bits_per_value,
           CAST(ceil(ln(COUNT(DISTINCT {c}))
                     / ln(2)) AS BIGINT) AS dict_bits_per_value,
           round(AVG(len({c})) * 8.0
                 / ceil(ln(COUNT(DISTINCT {c})) / ln(2)), 4)
             AS compression_ratio,
           AVG(len({c})) * 8.0
             / ceil(ln(COUNT(DISTINCT {c})) / ln(2)) >= {_DICT_BAR}
             AS use_dictionary
    FROM {t}
    """
    for t, c in _DICT_COLS
)


@register("q_dict_encoding", _DICT_SQL + " ORDER BY tbl, col")
def q_dict_encoding(spark, sf_dir):
    """R504 — dictionary-encoding advisor over four catalog string
    columns: index width = ceil(log2(distinct)), plain width = mean
    UTF-8 bits, keep the dictionary when plain/dict ≥ {bar}×. Exact
    integer/log arithmetic shared token-for-token with the twin. Plan:
    one 1-row agg per column (count-distinct partial-aggregates),
    union of 4 rows.""".format(bar=_DICT_BAR)
    from arrow_supercluster_spark.sources.tables import read_table

    outs = []
    for t, c in _DICT_COLS:
        df = read_table(spark, sf_dir, t)
        d = F.countDistinct(c)
        plain = F.avg(F.length(c)) * 8.0
        dict_bits = F.ceil(F.log(d) / F.log(F.lit(2.0))).cast("long")
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_values"),
                d.cast("long").alias("n_distinct"),
                F.round(plain, 4).alias("plain_bits_per_value"),
                dict_bits.alias("dict_bits_per_value"),
                F.round(plain / dict_bits, 4).alias("compression_ratio"),
                (plain / dict_bits >= _DICT_BAR).alias("use_dictionary"),
            ).select(
                F.lit(t).alias("tbl"), F.lit(c).alias("col"),
                "n_values", "n_distinct", "plain_bits_per_value",
                "dict_bits_per_value", "compression_ratio",
                "use_dictionary",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("tbl", "col")


# ===========================================================================
# R505 — run-length structure in storage order
# ===========================================================================

@register(
    "q_rle_stats",
    """
    WITH ordered AS (
      SELECT ts, event_id, event_type,
             LAG(event_type) OVER (ORDER BY ts, event_id) AS prev
      FROM events
    ),
    flagged AS (
      SELECT SUM(CASE WHEN prev IS NULL OR event_type <> prev
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_id
      FROM ordered
    ),
    runs AS (
      SELECT run_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM flagged GROUP BY run_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(SUM(run_len) AS BIGINT) AS n_rows,
           round(AVG(run_len), 6) AS avg_run_len,
           CAST(MAX(run_len) AS BIGINT) AS max_run_len
    FROM runs
    """,
)
def q_rle_stats(spark, sf_dir):
    """R505 — RLE structure of event_type in (ts, event_id) storage
    order: run count, mean and max run length. The Spark plan builds
    adjacency from zip_scan's global rank plus an idx-1 equi-join and
    run ids from a second zip_scan running sum of the change flags —
    the two-pass distributed form of the oracle's LAG + cumulative
    SUM window (which would be a single-reducer plan at corpus
    scale). Near-random event types ⇒ mean run length near
    1/(1-Σp²); a sorted table would collapse to |types| runs — the
    sort-key decision this measures."""
    ev = read_events(spark, sf_dir).select("ts", "event_id", "event_type")
    ranked, n, _ = zip_scan(ev, ["ts", "event_id"], out="idx")
    prev = ranked.select(
        (F.col("idx") + 1).alias("idx"),
        F.col("event_type").alias("prev"),
    )
    flagged = (
        ranked.join(prev, "idx", "left")
        .select(
            "idx",
            F.when(
                F.col("prev").isNull()
                | (F.col("event_type") != F.col("prev")),
                1,
            ).otherwise(0).alias("chg"),
        )
    )
    with_runs, _, _ = zip_scan(
        flagged, ["idx"], out="idx2", scan_col="chg", scan_out="run_id"
    )
    runs = with_runs.groupBy("run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("run_len").cast("long").alias("n_rows"),
        F.round(F.avg("run_len"), 6).alias("avg_run_len"),
        F.max("run_len").cast("long").alias("max_run_len"),
    )


# ===========================================================================
# R506 — zone-map skip effectiveness under two orderings
# ===========================================================================

@register(
    "q_zone_map_skips",
    f"""
    WITH vals AS (
      SELECT event_id, value FROM events WHERE value IS NOT NULL
    ),
    nat AS (
      SELECT CAST(floor(event_id / {_ZM_PAGE}) AS BIGINT) AS page,
             MAX(value) AS pmax
      FROM vals GROUP BY 1
    ),
    srt AS (
      SELECT page, MAX(value) AS pmax FROM (
        SELECT value,
               CAST(floor((ROW_NUMBER() OVER (ORDER BY value, event_id)
                           - 1) / {_ZM_PAGE}) AS BIGINT) AS page
        FROM vals
      ) GROUP BY page
    )
    SELECT ordering, n_pages, n_skippable,
           round(n_skippable * 1.0 / n_pages, 6) AS skip_rate
    FROM (
      SELECT 'natural' AS ordering,
             CAST(COUNT(*) AS BIGINT) AS n_pages,
             CAST(SUM(CASE WHEN pmax < {_ZM_THRESH} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_skippable
      FROM nat
      UNION ALL
      SELECT 'value_sorted',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN pmax < {_ZM_THRESH} THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM srt
    ) ORDER BY ordering
    """,
)
def q_zone_map_skips(spark, sf_dir):
    """R506 — zone-map effectiveness for `value >= {t}` under two
    physical orderings: natural event_id pages ({p} rows each) where
    every page mixes the full value range, vs value-sorted pages
    (rank from the distributed zip_scan) where all sub-threshold
    pages are skippable. The sorted rank is the only non-trivial
    stage; pages are groupBy keys. The quantified case for sort keys
    and z-ordering: same data, same predicate, skip rate ~0 → the sub-threshold mass.""".format(
        t=_ZM_THRESH, p=_ZM_PAGE
    )
    ev = (
        read_events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
    )
    nat = ev.groupBy(
        F.floor(F.col("event_id") / _ZM_PAGE).cast("long").alias("page")
    ).agg(F.max("value").alias("pmax"))
    ranked, _, _ = zip_scan(ev, ["value", "event_id"], out="idx")
    srt = ranked.groupBy(
        F.floor(F.col("idx") / _ZM_PAGE).cast("long").alias("page")
    ).agg(F.max("value").alias("pmax"))

    def summarize(pages, label):
        return pages.agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(F.col("pmax") < _ZM_THRESH, 1).otherwise(0))
            .cast("long").alias("n_skippable"),
        ).select(
            F.lit(label).alias("ordering"), "n_pages", "n_skippable",
            F.round(
                F.col("n_skippable") * 1.0 / F.col("n_pages"), 6
            ).alias("skip_rate"),
        )

    return (
        summarize(nat, "natural")
        .unionByName(summarize(srt, "value_sorted"))
        .orderBy("ordering")
    )
