"""Round-5 registry additions, batch 111 — streaming anomaly flags,
voice-activity detection, and ROLLUP grouping sets:

- q_anomaly_stream: stream-static z-score anomaly detection — batch
  baselines (per-type mean/std in exact integer cents) broadcast into
  every micro-batch; |z| ≥ 3 flags. Because the moments are integer
  sums, the streaming result is bit-identical to the batch z-score
  filter, which is why this streaming query can carry a full SQL
  oracle (rare — most streaming entries are rows-only).
- q_vad_segments: energy-based voice-activity detection over REAL
  gated WAV payloads (sine amplitude-gated by a deterministic on/off
  pattern — true silence gaps with known ground truth). Per-file frame
  energies → threshold → merged voiced segments. Rows-only (binary
  decode); the python oracle + gate-pattern parity live in
  tests/test_batch111.py.
- q_grouping_sets: explicit GROUPING SETS ((source), (lang), ()) with
  GROUPING() ids — the third grouping-lattice surface next to
  q_cube_agg (full 2^d lattice) and q_rollup_agg (prefix ladder):
  you name exactly the set list, and Spark's Expand emits only those
  branches. (First drafted as a ROLLUP+GROUPING() entry; the
  duplicate-registration guard flagged that q_rollup_agg already
  ships in registry_ext4 — kept the original, pivoted this slot to
  the set-list surface neither existing entry exercises.)
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry_core import register
from arrow_supercluster_spark.streaming.anomaly import (
    Z_THRESHOLD,
    baseline_stats,
    streaming_anomaly_flags,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@register(
    "q_anomaly_stream",
    f"""
    WITH base AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(round(value * 100) AS BIGINT)) AS sc,
             SUM(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS ssq
      FROM events GROUP BY event_type
    ),
    stats AS (
      SELECT event_type,
             sc / (100.0 * n) AS mean,
             sqrt((ssq - sc * sc / n) / (10000.0 * (n - 1))) AS std
      FROM base
    )
    SELECT e.event_id, e.event_type,
           round(e.value, 4) AS value,
           round((e.value - s.mean) / s.std, 4) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mean) / s.std) >= {Z_THRESHOLD}
    ORDER BY e.event_id
    """,
)
def q_anomaly_stream(spark, sf_dir):
    """R330 — streaming anomaly detection, stream-static posture:
    baselines (per-event_type mean/std over exact integer-cent moments,
    streaming/anomaly.baseline_stats) are batch-computed and BROADCAST;
    the event stream (availableNow file stream → memory sink) joins
    them statelessly per micro-batch and flags |z| ≥ {z}. No state
    store, no watermark coupling — each micro-batch is a map-only stage
    after the broadcast. The integer-cent moments make every z bit
    -identical between the streaming run and the batch SQL twin, so
    this streaming entry carries a full oracle; the streaming≡batch
    row-set equality is additionally pinned in
    tests/test_batch111.py.""".format(z=Z_THRESHOLD)
    ev = _events(spark, sf_dir)
    baseline = baseline_stats(ev)
    src = tempfile.mkdtemp(prefix="anomaly_stream_src_")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    name = "anomaly_stream_sink"
    q = (
        streaming_anomaly_flags(stream, baseline)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).orderBy("event_id")


@register("q_vad_segments", None)
def q_vad_segments(spark, sf_dir):
    """R331 — voice-activity detection over real gated-WAV payloads
    (multimodal.synthesize_wav_gated: 8 × 500-sample on/off segments
    with a deterministic pattern). 20 ms frame RMS → 0.1 threshold →
    consecutive voiced frames merge into segments; per file: counts,
    voiced fraction, first-segment bounds. Arrow-batched mapInPandas —
    decode-where-the-bytes-sit, scalar outputs only (media never
    shuffles). Rows-only; python-oracle + gate-pattern-parity tests in
    tests/test_batch111.py."""
    from arrow_supercluster_spark.operators import multimodal as mm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mm.audio_vad(mm.documents_as_gated_audio(docs))


@register(
    "q_grouping_sets",
    """
    SELECT coalesce(source, 'ALL') AS source_lvl,
           coalesce(lang, 'ALL') AS lang_lvl,
           CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY GROUPING SETS ((source), (lang), ())
    ORDER BY gid, source_lvl, lang_lvl
    """,
)
def q_grouping_sets(spark, sf_dir):
    """R332 — explicit GROUPING SETS ((source), (lang), ()) with
    GROUPING() provenance ids: per-source totals, per-lang totals, and
    the grand total in ONE aggregation — the named-set-list surface
    that CUBE (q_cube_agg, full 2^d lattice) and ROLLUP (q_rollup_agg,
    prefix ladder) can't express (neither emits (lang) without
    (source, lang)). Spark plans this as a single Expand (one branch
    per named set) + one shuffle — at 100 TB all three reports ride
    one pass over the corpus instead of three."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.groupingSets(
            [["source"], ["lang"], []], "source", "lang"
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (
                F.grouping("source") * 2 + F.grouping("lang")
            ).cast("long").alias("gid"),
        )
        .select(
            F.coalesce("source", F.lit("ALL")).alias("source_lvl"),
            F.coalesce("lang", F.lit("ALL")).alias("lang_lvl"),
            "gid",
            "n_docs",
            "total_chars",
        )
        .orderBy("gid", "source_lvl", "lang_lvl")
    )
