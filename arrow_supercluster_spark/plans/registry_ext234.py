"""Round-10 registry additions, batch 234 — lakehouse table-maintenance
PLANNERS (VERDICT r9 "Next round" #8: Delta-style OPTIMIZE/Z-ORDER
maintenance over the existing zorder/compaction primitives, plus the
multi-tenant-fairness audit).  The existing q_compact_files /
q_zorder_scan / q_zone_map_skips entries DO the physical work; this
batch adds the DECISION layer a 100 TB table-maintenance service runs
first — which files to compact, whether a Z-ORDER rewrite pays, what a
VACUUM reclaims, what changed between snapshots, and whether tenants
share the pipeline fairly.  All six are SQL-backed, pure
aggregation/window algebra over deterministic manifests derived from
the TPC-H tables (file = key mod F, bytes = 512 + price-cents mod 4096
— an exact-integer stand-in for on-disk sizes; no real file I/O, so the
planner grain stays engine-checkable):

- q_optimize_bins: OPTIMIZE bin-packing plan — small files (below 0.8x
  the integer-exact average) packed by exclusive-prefix-sum DIV target
  into rewrite bins (next-fit by cumulative size; deterministic, one
  window).
- q_zorder_effect: the OPTIMIZE-ZORDER-BY decision metric — per-file
  2-D zone extents and box-predicate skip counts under a hash layout
  vs a Morton-sorted layout of the SAME rows (bit-interleave via
  portable mod/compare arithmetic).
- q_vacuum_candidates: retention audit — dead file versions (overwritten
  by a newer write to the same file slot) older than the cutoff, with
  reclaimable bytes; single planner row.
- q_manifest_diff: snapshot diff — files added/removed/carried and byte
  delta per table partition between two date-window snapshots.
- q_tenant_fairness: multi-tenant pipeline audit — per-tenant usage
  shares in exact ppm plus Jain's fairness index (Σx)²/(n·Σx²) stapled
  on (double math only in the final rounded expression).
- q_compaction_speedup: projected scan-task reduction per partition:
  tasks_before = n_files, tasks_after = ceil(bytes/target) — the number
  that justifies (or kills) the rewrite.

At 100 TB: every query aggregates facts ONCE down to file/bin/tenant
grain (dimension-sized — file manifests are millions of rows where the
table is billions), then windows/joins at that grain; no pairwise
stages, no driver loops, no collects.  The Morton interleave is plain
integer arithmetic inside whole-stage codegen.  Delta Lake's OPTIMIZE /
Z-ORDER / VACUUM semantics are public (delta.io docs, Databricks
engineering blog); Iceberg's snapshot/manifest model likewise — only
the public semantics are mirrored here.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.sources.tables import read_events, read_table

# ---------------------------------------------------------------------------
# shared manifest algebra
# ---------------------------------------------------------------------------

# exact-integer per-row byte stand-in: 512 + cents mod 4096 (the test
# orders table carries no comment column; exact integer cents is the
# established cross-engine idiom — CAST(double) rounds in DuckDB but
# truncates in Spark, round() first makes both exact)
_ROW_BYTES = "512 + CAST(round(o_totalprice * 100) AS BIGINT) % 4096"

def _spark_row_bytes():
    """Spark half of _ROW_BYTES (minus the 512 constant, added at use)."""
    return F.pmod(F.round(F.col("o_totalprice") * 100).cast("long"), F.lit(4096))


_BITS = 6  # Morton interleave width per dimension (values in [0, 64))


def _sql_bit(col: str, i: int) -> str:
    """Portable bit extraction: mod/compare only (no engine-specific
    integer-division operator)."""
    return f"(CASE WHEN ({col}) % {2 ** (i + 1)} >= {2 ** i} THEN 1 ELSE 0 END)"


def _sql_morton(x: str, y: str) -> str:
    """Morton key: x bits at even positions, y bits at odd — pure
    integer arithmetic, identical in both engines."""
    terms = []
    for i in range(_BITS):
        terms.append(f"{_sql_bit(x, i)} * {4 ** i}")
        terms.append(f"{_sql_bit(y, i)} * {2 * 4 ** i}")
    return "(" + " + ".join(terms) + ")"


def _spark_bit(col, i: int):
    return F.when(col % (2 ** (i + 1)) >= 2 ** i, 1).otherwise(0)


def _spark_morton(x, y):
    m = F.lit(0)
    for i in range(_BITS):
        m = m + _spark_bit(x, i) * (4 ** i) + _spark_bit(y, i) * (2 * 4 ** i)
    return m


def _spark_files(spark, sf_dir, n_files: int):
    """orders → deterministic file manifest (file_id, fbytes, n_rows)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.pmod("o_orderkey", F.lit(n_files)).alias("file_id"))
        .agg(
            F.sum(512 + _spark_row_bytes()).cast("long").alias("fbytes"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _sql_files(n_files: int) -> str:
    return f"""
    files AS MATERIALIZED (
      SELECT o_orderkey % {n_files} AS file_id,
             CAST(SUM({_ROW_BYTES}) AS BIGINT) AS fbytes,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM orders GROUP BY o_orderkey % {n_files}
    )"""


# ===========================================================================
# R683 — OPTIMIZE bin-packing plan
# ===========================================================================

_OPT_FILES = 200


@register(
    "q_optimize_bins",
    f"""
    WITH {_sql_files(_OPT_FILES)},
    st AS (
      SELECT CAST(SUM(fbytes) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS nf
      FROM files
    ),
    smalls AS MATERIALIZED (
      SELECT f.file_id, f.fbytes
      FROM files f CROSS JOIN st
      WHERE f.fbytes * 5 * st.nf < st.total * 4
    ),
    packed AS (
      SELECT file_id, fbytes,
             COALESCE(SUM(fbytes) OVER (ORDER BY file_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before,
             (SELECT CAST(total * 4 // nf AS BIGINT) FROM st) AS target
      FROM smalls
    )
    SELECT CAST(cum_before // target AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(fbytes) AS BIGINT) AS bin_bytes
    FROM packed GROUP BY 1 ORDER BY bin_id
    """,
)
def q_optimize_bins(spark, sf_dir):
    """R683 — Delta-style OPTIMIZE plan: files below 0.8× the average
    size (exact integer comparison fbytes·5·n < total·4 — no float
    threshold) are packed into rewrite bins by exclusive prefix sum DIV
    target (next-fit by cumulative size, target = 4× average).  One
    window over the file-grain manifest; deterministic bin ids, so the
    plan itself is engine-checkable.  At 100 TB the manifest is
    millions of rows against billions in the table — planner cost is
    negligible and the window keys on a single ordered pass."""
    files = _spark_files(spark, sf_dir, _OPT_FILES)
    st = files.agg(
        F.sum("fbytes").cast("long").alias("total"),
        F.count(F.lit(1)).alias("nf"),
    )
    smalls = (
        files.crossJoin(F.broadcast(st))  # 1-row scalar
        .filter(F.col("fbytes") * 5 * F.col("nf") < F.col("total") * 4)
        .withColumn("target", F.expr("CAST(total * 4 DIV nf AS BIGINT)"))
    )
    w = Window.orderBy("file_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    packed = smalls.select(
        "file_id",
        "fbytes",
        F.coalesce(F.sum("fbytes").over(w), F.lit(0)).alias("cum_before"),
        "target",
    )
    return (
        packed.groupBy(
            F.expr("CAST(cum_before DIV target AS BIGINT)").alias("bin_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("fbytes").cast("long").alias("bin_bytes"),
        )
        .orderBy("bin_id")
    )


# ===========================================================================
# R684 — Z-ORDER effectiveness audit
# ===========================================================================

_ZE_FILES = 64
_ZE_BOX = (8, 23, 16, 47)  # d1 lo/hi, d2 lo/hi


@register(
    "q_zorder_effect",
    f"""
    WITH rows_d AS MATERIALIZED (
      SELECT o_orderkey,
             o_custkey % 64 AS d1,
             (CAST(round(o_totalprice * 100) AS BIGINT) // 1000000) % 64 AS d2
      FROM orders
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM rows_d),
    keyed AS (
      SELECT d1, d2,
             ROW_NUMBER() OVER (ORDER BY {_sql_morton("d1", "d2")},
                                o_orderkey) - 1 AS rk
      FROM rows_d
    ),
    assigned AS MATERIALIZED (
      SELECT 'hash' AS layout, o_orderkey % {_ZE_FILES} AS file_id, d1, d2
      FROM rows_d
      UNION ALL
      SELECT 'zorder' AS layout,
             CAST(k.rk * {_ZE_FILES} // n.n_rows AS BIGINT) AS file_id,
             k.d1, k.d2
      FROM keyed k CROSS JOIN n
    ),
    zones AS (
      SELECT layout, file_id,
             MIN(d1) AS lo1, MAX(d1) AS hi1,
             MIN(d2) AS lo2, MAX(d2) AS hi2
      FROM assigned GROUP BY layout, file_id
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM((hi1 - lo1 + 1) * (hi2 - lo2 + 1)) AS BIGINT)
             AS total_extent,
           CAST(SUM(CASE WHEN hi1 < {_ZE_BOX[0]} OR lo1 > {_ZE_BOX[1]}
                          OR hi2 < {_ZE_BOX[2]} OR lo2 > {_ZE_BOX[3]}
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped
    FROM zones GROUP BY layout ORDER BY layout
    """,
)
def q_zorder_effect(spark, sf_dir):
    """R684 — the OPTIMIZE ZORDER BY decision metric: the same rows
    assigned to {f} files under (a) hash layout and (b) Morton-sorted
    layout (bit-interleave of two 6-bit dimensions via portable
    mod/compare arithmetic — integer-exact in both engines; rank→file
    by the exact rk·F/n integer division, the zip-scan rule).  Per-file
    2-D zone extents summed, plus zone-map skip counts for a fixed box
    predicate: the zorder row's total_extent collapsing vs hash is
    precisely the win a Z-ORDER rewrite buys.  Extends q_zone_map_skips
    (1-D sorted layout) to the 2-D interleave case."""
    o = read_table(spark, sf_dir, "orders")
    rows_d = o.select(
        "o_orderkey",
        F.pmod("o_custkey", F.lit(64)).alias("d1"),
        F.pmod(
            F.expr(
                "CAST(round(o_totalprice * 100) AS BIGINT) DIV 1000000"
            ),
            F.lit(64),
        ).alias("d2"),
    )
    hash_side = rows_d.select(
        F.lit("hash").alias("layout"),
        F.pmod("o_orderkey", F.lit(_ZE_FILES)).alias("file_id"),
        "d1",
        "d2",
    )
    # distributed exact rank by Morton key (functions/distrank.zip_scan:
    # range-partitioned sort + per-partition offsets — NO global
    # single-partition window; the q_zone_map_skips rank discipline)
    from arrow_supercluster_spark.functions import distrank

    keyed = rows_d.withColumn(
        "mkey", _spark_morton(F.col("d1"), F.col("d2"))
    )
    ranked, n_rows, _ = distrank.zip_scan(
        keyed, ["mkey", "o_orderkey"], out="rk"
    )
    z_side = ranked.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"CAST(rk * {_ZE_FILES} DIV {int(n_rows)} AS BIGINT)").alias(
            "file_id"
        ),
        "d1",
        "d2",
    )
    assigned = hash_side.unionByName(z_side)
    lo, hi, lo2, hi2 = _ZE_BOX
    zones = assigned.groupBy("layout", "file_id").agg(
        F.min("d1").alias("lo1"),
        F.max("d1").alias("hi1"),
        F.min("d2").alias("lo2"),
        F.max("d2").alias("hi2"),
    )
    skipped = F.when(
        (F.col("hi1") < lo)
        | (F.col("lo1") > hi)
        | (F.col("hi2") < lo2)
        | (F.col("lo2") > hi2),
        1,
    ).otherwise(0)
    return (
        zones.groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(
                (F.col("hi1") - F.col("lo1") + 1)
                * (F.col("hi2") - F.col("lo2") + 1)
            )
            .cast("long")
            .alias("total_extent"),
            F.sum(skipped).cast("long").alias("files_skipped"),
        )
        .orderBy("layout")
    )


# ===========================================================================
# R685 — VACUUM candidates
# ===========================================================================

_VAC_FILES = 150
_VAC_CUTOFF = "1997-01-01"


@register(
    "q_vacuum_candidates",
    f"""
    WITH writes AS MATERIALIZED (
      SELECT o_orderkey % {_VAC_FILES} AS file_id,
             o_orderkey AS version,
             CAST({_ROW_BYTES} AS BIGINT) AS wbytes,
             o_orderdate AS wdate
      FROM orders
    ),
    ranked AS (
      SELECT file_id, version, wbytes, wdate,
             ROW_NUMBER() OVER (PARTITION BY file_id
                                ORDER BY version DESC) AS rn
      FROM writes
    )
    SELECT CAST(SUM(CASE WHEN rn > 1
                          AND wdate < TIMESTAMP '{_VAC_CUTOFF}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN rn > 1
                          AND wdate < TIMESTAMP '{_VAC_CUTOFF}'
                         THEN wbytes ELSE 0 END) AS BIGINT)
             AS bytes_reclaimed,
           CAST(SUM(CASE WHEN rn > 1
                          AND wdate >= TIMESTAMP '{_VAC_CUTOFF}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dead_retained,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_live
    FROM ranked
    """,
)
def q_vacuum_candidates(spark, sf_dir):
    """R685 — VACUUM retention audit: every order is a write (version =
    o_orderkey) to file slot key mod {f}; a write is DEAD when a newer
    version exists for the same slot.  Dead versions dated before the
    retention cutoff are reclaim candidates (count + exact bytes);
    dead-but-retained and live counts complete the planner row.  One
    file-grain window — the Delta VACUUM dry-run shape."""
    o = read_table(spark, sf_dir, "orders")
    writes = o.select(
        F.pmod("o_orderkey", F.lit(_VAC_FILES)).alias("file_id"),
        F.col("o_orderkey").alias("version"),
        (512 + _spark_row_bytes()).cast("long").alias("wbytes"),
        F.col("o_orderdate").alias("wdate"),
    )
    w = Window.partitionBy("file_id").orderBy(F.col("version").desc())
    ranked = writes.withColumn("rn", F.row_number().over(w))
    old = F.col("wdate") < F.lit(_VAC_CUTOFF).cast("timestamp")
    dead = F.col("rn") > 1
    return ranked.agg(
        F.sum(F.when(dead & old, 1).otherwise(0))
        .cast("long")
        .alias("n_candidates"),
        F.sum(F.when(dead & old, F.col("wbytes")).otherwise(0))
        .cast("long")
        .alias("bytes_reclaimed"),
        F.sum(F.when(dead & ~old, 1).otherwise(0))
        .cast("long")
        .alias("n_dead_retained"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_live"),
    )


# ===========================================================================
# R686 — snapshot manifest diff
# ===========================================================================

_DIFF_FILES = 80


@register(
    "q_manifest_diff",
    f"""
    WITH v1 AS MATERIALIZED (
      SELECT o_orderpriority AS part,
             o_orderkey % {_DIFF_FILES} AS file_id,
             CAST(SUM({_ROW_BYTES}) AS BIGINT) AS fbytes
      FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
      GROUP BY 1, 2
    ),
    v2 AS MATERIALIZED (
      SELECT o_orderpriority AS part,
             o_orderkey % {_DIFF_FILES} AS file_id,
             CAST(SUM({_ROW_BYTES}) AS BIGINT) AS fbytes
      FROM orders WHERE o_orderdate >= TIMESTAMP '1994-01-01'
      GROUP BY 1, 2
    ),
    j AS (
      SELECT COALESCE(v1.part, v2.part) AS part,
             v1.file_id AS f1, v2.file_id AS f2,
             COALESCE(v1.fbytes, 0) AS b1, COALESCE(v2.fbytes, 0) AS b2
      FROM v1 FULL OUTER JOIN v2
        ON v1.part = v2.part AND v1.file_id = v2.file_id
    )
    SELECT part,
           CAST(SUM(CASE WHEN f1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS files_added,
           CAST(SUM(CASE WHEN f2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS files_removed,
           CAST(SUM(CASE WHEN f1 IS NOT NULL AND f2 IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_carried,
           CAST(SUM(b2 - b1) AS BIGINT) AS bytes_delta
    FROM j GROUP BY part ORDER BY part
    """,
)
def q_manifest_diff(spark, sf_dir):
    """R686 — snapshot diff at manifest grain: two date-window snapshots
    of the same table (v1 = pre-1996, v2 = 1994-onward), files keyed by
    slot within each o_orderpriority partition; emit per-partition
    added/removed/carried file counts and the exact byte delta.  The
    Iceberg snapshot-diff / Delta DESCRIBE HISTORY shape: a full outer
    join of two dimension-sized manifests, never of the fact rows."""
    o = read_table(spark, sf_dir, "orders")

    def snap(pred):
        return (
            o.filter(pred)
            .groupBy(
                F.col("o_orderpriority").alias("part"),
                F.pmod("o_orderkey", F.lit(_DIFF_FILES)).alias("file_id"),
            )
            .agg(F.sum(512 + _spark_row_bytes()).cast("long").alias("fbytes"))
        )

    v1 = snap(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    v2 = snap(F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
    j = v1.alias("a").join(
        v2.alias("b"),
        (F.col("a.part") == F.col("b.part"))
        & (F.col("a.file_id") == F.col("b.file_id")),
        "full_outer",
    ).select(
        F.coalesce(F.col("a.part"), F.col("b.part")).alias("part"),
        F.col("a.file_id").alias("f1"),
        F.col("b.file_id").alias("f2"),
        F.coalesce(F.col("a.fbytes"), F.lit(0)).alias("b1"),
        F.coalesce(F.col("b.fbytes"), F.lit(0)).alias("b2"),
    )
    return (
        j.groupBy("part")
        .agg(
            F.sum(F.when(F.col("f1").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("files_added"),
            F.sum(F.when(F.col("f2").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("files_removed"),
            F.sum(
                F.when(
                    F.col("f1").isNotNull() & F.col("f2").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("files_carried"),
            F.sum(F.col("b2") - F.col("b1")).cast("long").alias("bytes_delta"),
        )
        .orderBy("part")
    )


# ===========================================================================
# R687 — multi-tenant fairness audit
# ===========================================================================

_TEN_MOD = 12


@register(
    "q_tenant_fairness",
    f"""
    WITH t AS MATERIALIZED (
      SELECT user_id % {_TEN_MOD} AS tenant,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS cents
      FROM events GROUP BY user_id % {_TEN_MOD}
    )
    SELECT tenant, n_events, cents,
           CAST(cents * 1000000 // (SUM(cents) OVER ()) AS BIGINT)
             AS share_ppm,
           round(CAST(SUM(cents) OVER () AS DOUBLE)
                 * CAST(SUM(cents) OVER () AS DOUBLE)
                 / (COUNT(*) OVER ()
                    * CAST(SUM(cents * cents) OVER () AS DOUBLE)), 6)
             AS jain_index
    FROM t ORDER BY tenant
    """,
)
def q_tenant_fairness(spark, sf_dir):
    """R687 — multi-tenant pipeline-fairness audit: tenants = user_id
    mod {m}; usage = event count + exact purchase cents; share in exact
    integer ppm (cents·1e6 DIV total); Jain's fairness index
    (Σx)²/(n·Σx²) stapled onto every row via unbounded windows — sums
    accumulate as exact BIGINT, doubles appear only inside the one
    rounded expression, so both engines compute the identical value.
    Jain = 1 is perfect fairness; 1/n is one tenant hogging the
    pipeline — the scheduler-audit number (Jain et al. 1984, DEC-TR-301,
    public)."""
    ev = read_events(spark, sf_dir)
    t = ev.groupBy(F.pmod("user_id", F.lit(_TEN_MOD)).alias("tenant")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("cents"),
    )
    w = Window.partitionBy()
    total = F.sum("cents").over(w)
    nt = F.count(F.lit(1)).over(w)
    sumsq = F.sum(F.col("cents") * F.col("cents")).over(w)
    return t.select(
        "tenant",
        "n_events",
        "cents",
        F.expr("CAST(cents * 1000000 DIV (SUM(cents) OVER ()) AS BIGINT)").alias(
            "share_ppm"
        ),
        F.round(
            total.cast("double") * total.cast("double")
            / (nt * sumsq.cast("double")),
            6,
        ).alias("jain_index"),
    ).orderBy("tenant")


# ===========================================================================
# R688 — compaction speedup projection
# ===========================================================================

_SPD_FILES = 120
_SPD_TARGET = 262144  # 256 KiB target file


@register(
    "q_compaction_speedup",
    f"""
    WITH pf AS MATERIALIZED (
      SELECT o_orderpriority AS part,
             o_orderkey % {_SPD_FILES} AS file_id,
             CAST(SUM({_ROW_BYTES}) AS BIGINT) AS fbytes
      FROM orders GROUP BY 1, 2
    )
    SELECT part,
           CAST(COUNT(*) AS BIGINT) AS tasks_before,
           CAST(SUM(fbytes) AS BIGINT) AS total_bytes,
           CAST((SUM(fbytes) + {_SPD_TARGET - 1}) // {_SPD_TARGET} AS BIGINT)
             AS tasks_after,
           round(COUNT(*) * 1.0
                 / ((SUM(fbytes) + {_SPD_TARGET - 1}) // {_SPD_TARGET}), 4)
             AS speedup
    FROM pf GROUP BY part ORDER BY part
    """,
)
def q_compaction_speedup(spark, sf_dir):
    """R688 — the number that justifies a compaction rewrite: per
    partition, scan tasks before (one per file) vs after (one per
    {t}-byte target file, exact ceil by (Σ+t−1) DIV t) and their ratio.
    Pure two-level aggregation; pairs with q_compact_files (which DOES
    the rewrite via shuffle-free coalesce) as its planning front-end."""
    o = read_table(spark, sf_dir, "orders")
    pf = o.groupBy(
        F.col("o_orderpriority").alias("part"),
        F.pmod("o_orderkey", F.lit(_SPD_FILES)).alias("file_id"),
    ).agg(F.sum(512 + _spark_row_bytes()).cast("long").alias("fbytes"))
    t = _SPD_TARGET
    return (
        pf.groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("tasks_before"),
            F.sum("fbytes").cast("long").alias("total_bytes"),
            F.expr(f"CAST((SUM(fbytes) + {t - 1}) DIV {t} AS BIGINT)").alias(
                "tasks_after"
            ),
            F.round(
                F.count(F.lit(1))
                * 1.0
                / F.expr(f"CAST((SUM(fbytes) + {t - 1}) DIV {t} AS BIGINT)"),
                4,
            ).alias("speedup"),
        )
        .orderBy("part")
    )
