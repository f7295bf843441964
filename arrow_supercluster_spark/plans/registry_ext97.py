"""Round-4 registry additions, batch 92 — value-range window frames,
annotator agreement, and the streaming session-window twin:

- q_range_frame: a RANGE-by-VALUE window frame (±500 of each order's
  totalprice within its priority) — the one window-frame kind the
  registry didn't yet exercise (rows frames and growing frames are
  everywhere; value-range frames bound peers by magnitude, not
  position). Oracle: identical RANGE BETWEEN frame in DuckDB.
- q_cohens_kappa: chance-corrected agreement κ = (p_o − p_e)/(1 − p_e)
  between the declared language and the stopword-vote detector — the
  scalar summary of q_lang_confusion's matrix (label-pipeline QA:
  "how much better than chance is the metadata/model agreement").
- q_session_stream: the STREAMING twin of q_session_window — the same
  session_window expression over a watermarked file stream
  (availableNow → memory sink). Rows-only; streaming ≡ batch equality
  is asserted in tests/test_batch92.py.

At 100 TB: the range frame partitions by priority (bounded keys);
kappa is two tiny joins over the |langs|² cell frame; the streaming
session state is open-sessions-per-user, closed by the watermark.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import textops
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import (
    _SQL_LANG_CASE,
    _SQL_LANG_SCORES,
)
from arrow_supercluster_spark.sources.tables import read_events

_RANGE_W = 500.0


@register(
    "q_range_frame",
    f"""
    SELECT o_orderkey, o_orderpriority AS priority,
           ROUND(o_totalprice, 2) AS price,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_within,
           -- exact integer cents: a double SUM over ~1k peers flips
           -- round boundaries on engine sum order, and cents/(100·n)
           -- lands on exact .5 round-4 boundaries where the engines'
           -- rounding paths disagree — so the frame aggregate stays
           -- an exact BIGINT and consumers divide
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER w AS BIGINT) AS sum_cents_within
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN {_RANGE_W} PRECEDING
                       AND {_RANGE_W} FOLLOWING)
    """,
)
def q_range_frame(spark, sf_dir):
    """Value-range window frame: each order's peer set is every order of
    the same priority within ±{0} of its price — RANGE frames bound
    peers by VALUE, which rows frames cannot express (ties and dense
    regions change the peer count). Partitioned by priority → bounded
    keys, gate-clean.""".format(_RANGE_W)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # the DataFrame API's rangeBetween only accepts integer offsets;
    # fractional value-range frames go through the SQL window spec
    frame = (
        "PARTITION BY o_orderpriority ORDER BY o_totalprice "
        f"RANGE BETWEEN {_RANGE_W} PRECEDING AND {_RANGE_W} FOLLOWING"
    )
    return o.selectExpr(
        "o_orderkey",
        "o_orderpriority AS priority",
        "round(o_totalprice, 2) AS price",
        f"count(1) OVER ({frame}) AS n_within",
        # integer-cent frame sum — exact under any aggregation order
        # (an averaged double here flips round-boundaries cross-engine)
        f"sum(cast(round(o_totalprice * 100) AS BIGINT)) OVER ({frame})"
        " AS sum_cents_within",
    )


@register(
    "q_cohens_kappa",
    f"""
    WITH pred AS (
      SELECT lang AS a, {_SQL_LANG_CASE} AS b
      FROM (
        SELECT doc_id, lang,
               {', '.join(f's_{l}' for l in sorted(textops.STOPWORDS))},
               greatest({', '.join(f's_{l}' for l in sorted(textops.STOPWORDS))})
                 AS best
        FROM (SELECT doc_id, lang, {_SQL_LANG_SCORES} FROM documents) t
      ) s
    ),
    cell AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM pred
             GROUP BY a, b),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cell),
    po AS (SELECT SUM(n) * 1.0 / (SELECT total FROM tot) AS po
           FROM cell WHERE a = b),
    marg AS (
      SELECT coalesce(ra.a, cb.b) AS lab,
             coalesce(ra.rn, 0) AS rn, coalesce(cb.cn, 0) AS cn
      FROM (SELECT a, SUM(n) AS rn FROM cell GROUP BY a) ra
      FULL OUTER JOIN (SELECT b, SUM(n) AS cn FROM cell GROUP BY b) cb
        ON cb.b = ra.a
    ),
    pe AS (
      SELECT SUM(rn * cn) * 1.0
             / ((SELECT total FROM tot) * (SELECT total FROM tot)) AS pe
      FROM marg
    )
    SELECT (SELECT total FROM tot) AS n,
           ROUND((SELECT po FROM po), 6) AS po,
           ROUND((SELECT pe FROM pe), 6) AS pe,
           ROUND(((SELECT po FROM po) - (SELECT pe FROM pe))
                 / (1 - (SELECT pe FROM pe)), 6) AS kappa
    """,
)
def q_cohens_kappa(spark, sf_dir):
    """Cohen's κ between declared `lang` and the stopword-vote detector:
    observed agreement p_o minus chance agreement p_e (product of
    marginals), scaled. The |langs|² cell frame is tiny; marginals use
    a full outer join so labels present on only one side still
    contribute p_e mass."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pred = docs.select(
        F.col("lang").alias("a"),
        textops.lang_id_expr(F.col("text")).alias("b"),
    )
    cell = pred.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    tot = cell.agg(F.sum("n").alias("total"))
    po = (
        cell.filter(F.col("a") == F.col("b"))
        .agg(F.sum("n").alias("agree"))
        .crossJoin(F.broadcast(tot))
        .select((F.col("agree") / F.col("total")).alias("po"))
    )
    ra = cell.groupBy("a").agg(F.sum("n").alias("rn"))
    cb = cell.groupBy("b").agg(F.sum("n").alias("cn"))
    marg = ra.join(cb, ra.a == cb.b, "full_outer").select(
        F.coalesce("rn", F.lit(0)).alias("rn"),
        F.coalesce("cn", F.lit(0)).alias("cn"),
    )
    pe = (
        marg.crossJoin(F.broadcast(tot))
        .agg(
            (
                F.sum(F.col("rn") * F.col("cn"))
                / (F.first("total") * F.first("total"))
            ).alias("pe")
        )
    )
    return (
        tot.crossJoin(po)
        .crossJoin(pe)
        .select(
            F.col("total").alias("n"),
            F.round("po", 6).alias("po"),
            F.round("pe", 6).alias("pe"),
            F.round((F.col("po") - F.col("pe")) / (1 - F.col("pe")), 6).alias(
                "kappa"
            ),
        )
    )


_GAP_MIN = 30


@register("q_session_stream", None)
def q_session_stream(spark, sf_dir):
    """Streaming session windows — the IDENTICAL session_window
    expression as batch q_session_window, run over a watermarked file
    stream of the events table (availableNow, append to a memory sink:
    sessions emit when the watermark passes their close; the tail
    sessions the final watermark hasn't closed stay in state — correct
    append-mode semantics). Rows-only; tests assert the emitted set
    equals EXACTLY the batch sessions closed by the final watermark."""
    ev = read_events(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="session_stream_src_")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    name = "session_stream_sink"
    q = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", f"{_GAP_MIN} minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)
