"""Round-5 registry additions, batch 116 — causal estimation, long-
memory diagnostics, and binary media dedup:

- q_diff_in_diff: the 2×2 difference-in-differences estimator over
  (variant = user parity) × (period = first/second half of the
  window) on purchase values — the workhorse quasi-experimental
  causal design; all four cell means accumulate integer cents.
- q_hurst_rs: Hurst exponent by rescaled-range (R/S) analysis over the
  hourly event-count series — H > 0.5 long-memory, H ≈ 0.5 random
  walk, the fractal diagnostic for burst persistence. Per-block
  cumulative deviations stay integer; per-size means average integer
  -scaled R/S values; the final log-log slope is a closed form over
  ≤4 deterministic points.
- q_media_dedup: exact duplicate detection over BINARY media payloads
  (md5 of the file bytes, computed where the bytes sit) — the first
  dedup entry that operates on the media column rather than text; the
  corpus is constructed with known duplicate groups (payload keyed by
  doc_id mod 100), so the rollup has a closed-form ground truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events

_DID_SPLIT_DAY = 16  # days 1-15 pre, 16-30 post
_HURST_SIZES = (24, 48, 120, 240)  # hours per block
_MEDIA_DEDUP_MOD = 100


def _events(spark, sf_dir):
    # ts-touching queries must go through the normalizing reader (the
    # driver's events timestamp physical type varies by round)
    return read_events(spark, sf_dir)


# ===========================================================================
# R342 — difference-in-differences
# ===========================================================================

@register(
    "q_diff_in_diff",
    f"""
    WITH cells AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 'treat' ELSE 'control' END
               AS variant,
             CASE WHEN CAST(strftime(ts, '%d') AS INTEGER)
                       >= {_DID_SPLIT_DAY}
                  THEN 'post' ELSE 'pre' END AS period,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    means AS (
      SELECT variant, period,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(cents) / (100.0 * COUNT(*)) AS mean_value
      FROM cells GROUP BY variant, period
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 'treat' AND period = 'post'
                 THEN mean_value END) AS tp,
        MAX(CASE WHEN variant = 'treat' AND period = 'pre'
                 THEN mean_value END) AS tr,
        MAX(CASE WHEN variant = 'control' AND period = 'post'
                 THEN mean_value END) AS cp,
        MAX(CASE WHEN variant = 'control' AND period = 'pre'
                 THEN mean_value END) AS cr
      FROM means
    )
    SELECT variant, period, n, round(mean_value, 4) AS mean_value,
           round((SELECT (tp - tr) - (cp - cr) FROM wide), 4)
             AS did_estimate
    FROM means
    ORDER BY variant, period
    """,
)
def q_diff_in_diff(spark, sf_dir):
    """R342 — difference-in-differences on purchase values: variant =
    user parity (a stand-in assignment), period split at day
    {d}; DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post −
    ȳ_ctrl,pre) — the parallel-trends causal estimator. Cell sums are
    integer cents (exact, commutative); four cells → the estimate is a
    closed form on deterministic doubles, stapled to every cell row.
    One keyed agg + a 4-row pivot.""".format(d=_DID_SPLIT_DAY)
    cells = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(F.col("user_id") % 2 == 1, F.lit("treat"))
            .otherwise(F.lit("control"))
            .alias("variant"),
            F.when(
                F.dayofmonth("ts") >= _DID_SPLIT_DAY, F.lit("post")
            )
            .otherwise(F.lit("pre"))
            .alias("period"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    means = cells.groupBy("variant", "period").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("cents") / (100.0 * F.count(F.lit(1)))).alias("mean_value"),
    )
    wide = means.agg(
        F.max(
            F.when(
                (F.col("variant") == "treat") & (F.col("period") == "post"),
                F.col("mean_value"),
            )
        ).alias("tp"),
        F.max(
            F.when(
                (F.col("variant") == "treat") & (F.col("period") == "pre"),
                F.col("mean_value"),
            )
        ).alias("tr"),
        F.max(
            F.when(
                (F.col("variant") == "control") & (F.col("period") == "post"),
                F.col("mean_value"),
            )
        ).alias("cp"),
        F.max(
            F.when(
                (F.col("variant") == "control") & (F.col("period") == "pre"),
                F.col("mean_value"),
            )
        ).alias("cr"),
    ).select(
        F.round(
            (F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr")), 4
        ).alias("did_estimate")
    )
    return (
        means.crossJoin(F.broadcast(wide))
        .select(
            "variant",
            "period",
            "n",
            F.round("mean_value", 4).alias("mean_value"),
            "did_estimate",
        )
        .orderBy("variant", "period")
    )


# ===========================================================================
# R343 — Hurst exponent via rescaled-range analysis
# ===========================================================================

_SQL_HOURLY = """
    SELECT g.h, coalesce(h0.c, 0) AS c
    FROM (SELECT unnest(range(0, (SELECT MAX(date_diff('hour',
                  TIMESTAMP '2024-01-01 00:00:00', date_trunc('hour', ts)))
                  FROM events) + 1)) AS h) g
    LEFT JOIN (
      SELECT date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                       date_trunc('hour', ts)) AS h,
             COUNT(*) AS c
      FROM events GROUP BY 1
    ) h0 ON g.h = h0.h
"""


def _sql_hurst() -> str:
    per_size = []
    for n in _HURST_SIZES:
        per_size.append(f"""
    rs_{n} AS (
      SELECT {n} AS block_hours, blk,
             (MAX(cum_dev) - MIN(cum_dev)) * 1.0
               / sqrt((MAX(ssq) - MAX(s) * MAX(s) * 1.0 / MAX(cnt))
                      / MAX(cnt)) AS rs
      FROM (
        SELECT blk, cum_dev, SUM(c) OVER w2 AS s,
               SUM(c * c) OVER w2 AS ssq, COUNT(*) OVER w2 AS cnt
        FROM (
          SELECT h // {n} AS blk, c,
                 SUM(c) OVER (PARTITION BY h // {n} ORDER BY h)
                   - (h % {n} + 1)
                   * (SUM(c) OVER (PARTITION BY h // {n}) * 1.0 / {n})
                   AS cum_dev
          FROM hourly
        ) t
        WINDOW w2 AS (PARTITION BY blk)
      ) u
      GROUP BY blk
      HAVING MAX(ssq) - MAX(s) * MAX(s) * 1.0 / MAX(cnt) > 0
         AND MAX(cnt) = {n}
    )""")
    selects = " UNION ALL ".join(
        f"SELECT block_hours, CAST(round(AVG(round(rs * 1e6)) / 1e6, 6) "
        f"AS DOUBLE) AS mean_rs, CAST(COUNT(*) AS BIGINT) AS n_blocks "
        f"FROM rs_{n} GROUP BY 1"
        for n in _HURST_SIZES
    )
    return f"""
    WITH hourly AS ({_SQL_HOURLY}),
    {','.join(per_size)},
    sizes AS ({selects}),
    fit AS (
      SELECT (COUNT(*) * SUM(ln(block_hours) * ln(mean_rs))
              - SUM(ln(block_hours)) * SUM(ln(mean_rs)))
             / (COUNT(*) * SUM(ln(block_hours) * ln(block_hours))
                - SUM(ln(block_hours)) * SUM(ln(block_hours))) AS hurst
      FROM sizes
    )
    SELECT sizes.block_hours, sizes.mean_rs, sizes.n_blocks,
           round(fit.hurst, 4) AS hurst
    FROM sizes CROSS JOIN fit
    ORDER BY block_hours
    """


@register("q_hurst_rs", _sql_hurst())
def q_hurst_rs(spark, sf_dir):
    """R343 — Hurst exponent by R/S analysis over the hourly event
    counts: for each block size n ∈ {sizes}, split the series into
    complete n-hour blocks, compute R = range of mean-adjusted
    cumulative deviations and S = population std within the block,
    average R/S per size (integer-scaled before the mean so block
    order can't move the average), and fit H as the log-log OLS slope
    over ≤4 points (closed form). H ≈ 0.5 ⇒ memoryless arrivals;
    H > 0.5 ⇒ persistent bursts — the capacity-planning diagnostic.
    Windows are partitioned by block (≤ {mx} rows each); everything
    upstream is one hourly count agg.""".format(
        sizes=list(_HURST_SIZES), mx=max(_HURST_SIZES)
    )
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    h_col = F.floor(
        (
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
            - F.unix_timestamp(F.to_timestamp(F.lit("2024-01-01 00:00:00")))
        )
        / 3600
    )
    counts = ev.groupBy(h_col.alias("h")).agg(F.count(F.lit(1)).alias("c"))
    # densify: hours with no events are zeros, not holes — otherwise the
    # within-block position arithmetic (h mod n) is wrong at small SF
    grid = counts.agg(F.max("h").alias("mx")).select(
        F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("h")
    )
    hourly = grid.join(counts, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).alias("c")
    )
    out = None
    for n in _HURST_SIZES:
        w_ord = Window.partitionBy("blk").orderBy("h")
        w_all = Window.partitionBy("blk")
        staged = hourly.select(
            F.floor(F.col("h") / n).alias("blk"), "h", "c"
        ).select(
            "blk",
            "c",
            (
                F.sum("c").over(w_ord)
                - (F.pmod("h", F.lit(n)) + 1)
                * (F.sum("c").over(w_all) * 1.0 / n)
            ).alias("cum_dev"),
            F.sum("c").over(w_all).alias("s"),
            F.sum(F.col("c") * F.col("c")).over(w_all).alias("ssq"),
            F.count(F.lit(1)).over(w_all).alias("cnt"),
        )
        rs = (
            staged.groupBy("blk")
            .agg(
                (
                    (F.max("cum_dev") - F.min("cum_dev"))
                    * 1.0
                    / F.sqrt(
                        (
                            F.max("ssq")
                            - F.max("s") * F.max("s") * 1.0 / F.max("cnt")
                        )
                        / F.max("cnt")
                    )
                ).alias("rs"),
                F.max("ssq").alias("ssq"),
                F.max("s").alias("s"),
                F.max("cnt").alias("cnt"),
            )
            .filter(
                (
                    F.col("ssq") - F.col("s") * F.col("s") * 1.0 / F.col("cnt")
                    > 0
                )
                & (F.col("cnt") == n)
            )
        )
        row = rs.agg(
            F.lit(n).alias("block_hours"),
            (
                F.round(F.avg(F.round(F.col("rs") * 1e6)) / 1e6, 6)
            ).cast("double").alias("mean_rs"),
            F.count(F.lit(1)).alias("n_blocks"),
        )
        out = row if out is None else out.unionByName(row)
    lx = F.log("block_hours")
    ly = F.log("mean_rs")
    fit = out.agg(
        (
            (
                F.count(F.lit(1)) * F.sum(lx * ly)
                - F.sum(lx) * F.sum(ly)
            )
            / (
                F.count(F.lit(1)) * F.sum(lx * lx)
                - F.sum(lx) * F.sum(lx)
            )
        ).alias("hurst")
    )
    return (
        out.crossJoin(F.broadcast(fit))
        .select(
            "block_hours",
            "mean_rs",
            "n_blocks",
            F.round("hurst", 4).alias("hurst"),
        )
        .orderBy("block_hours")
    )


# ===========================================================================
# R344 — binary media payload dedup
# ===========================================================================

@register(
    "q_media_dedup",
    f"""
    WITH groups AS (
      SELECT doc_id % {_MEDIA_DEDUP_MOD} AS src_key,
             CAST(COUNT(*) AS BIGINT) AS n_copies,
             MIN(doc_id) AS keeper_id
      FROM documents GROUP BY 1
    )
    SELECT CAST(SUM(n_copies) AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(MAX(n_copies) AS BIGINT) AS max_group,
           CAST(SUM(keeper_id) AS BIGINT) AS keeper_id_sum
    FROM groups
    """,
)
def q_media_dedup(spark, sf_dir):
    """R344 — exact dedup over BINARY media payloads: the corpus
    synthesizes each doc's GIF from doc_id mod {m}, so every payload
    has ⌈n/{m}⌉-sized duplicate groups by construction; md5 runs where
    the bytes sit (no payload shuffle — only the 16-byte digest moves),
    groups key on the digest, the canonical keeper is the min media_id.
    Rollup: file/unique/group counts + largest group + canonical-id
    checksum. The SQL twin (added round 6, VERDICT r5 Next-round #8)
    derives the SAME rollup from the construction's ground truth —
    doc_id mod {m} groups — WITHOUT running the codec or md5, so the
    differential genuinely checks the digest/grouping plumbing: a codec
    collision or dedup bug breaks the match. GIF encoder injectivity in
    src_key is separately asserted in tests/test_batch116.py.
    The media twin of E1 exact text dedup — at 100 TB this is how you
    dedup an image/audio corpus before feature extraction.""".format(
        m=_MEDIA_DEDUP_MOD
    )
    from arrow_supercluster_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.pmod("doc_id", F.lit(_MEDIA_DEDUP_MOD)).alias("src_key")
    )
    media = mm.documents_as_gifs(
        docs.select(F.col("src_key").alias("doc_id")).distinct()
    ).select(
        F.col("media_id").alias("src_key"), "payload"
    )
    files = docs.join(media, "src_key").select(
        "doc_id", F.md5("payload").alias("digest")
    )
    groups = files.groupBy("digest").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_id"),
    )
    return groups.agg(
        F.sum("n_copies").cast("long").alias("n_files"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_groups"),
        F.max("n_copies").alias("max_group"),
        F.sum("keeper_id").cast("long").alias("keeper_id_sum"),
    )
