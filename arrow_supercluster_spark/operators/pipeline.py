"""Training-data pipeline composition operators (brief: "operations a
large-scale training-data pipeline would need" beyond the reference's own
surface — sampling, shard packing, corpus curation).

All three are pure JVM expression/window plans with DuckDB-twinnable
semantics, so each gets a full value-hash oracle (plans/registry_ext8.py).

Scale design (100 TB):
  * hash_sample — a narrow deterministic filter (Lehmer-style
    multiplicative hash in plain BIGINT arithmetic, no engine-specific
    hash function), evaluated at the scan: no shuffle, no RNG state,
    reproducible across engines/runs/partitionings, and the comparison
    predicate pushes down to parquet row groups when keys are clustered.
  * token_shards — first-fit-by-order packing is a running sum per
    stream; partitioning the window by language alone puts each language
    in ONE reducer (skew at 100 TB), so the operator sub-shards each
    language into `substreams` deterministic streams (doc_id mod) and
    packs within (lang, substream): reducers scale with
    n_langs·substreams while packing stays deterministic.
  * curate_corpus — exact-dedup keeps the min doc_id per md5(normalized
    text): the shuffle carries 16-byte digests, never text; the keeper
    join is id↔id; quality/lang are narrow expressions on the kept rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arrow_supercluster_spark.operators import textops
from arrow_supercluster_spark.operators.dedup import normalize_text

# Lehmer multiplicative hash: portable BIGINT arithmetic (overflow-safe
# for keys < 2^47), identical in any ANSI SQL engine — unlike
# xxhash64/murmur which differ per engine
HASH_MULT = 48271
HASH_MOD = 65537


def hash_bucket(key_col) -> "F.Column":
    return F.pmod(key_col * F.lit(HASH_MULT), F.lit(HASH_MOD))


def hash_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Deterministic pseudo-random sample of ~`rate` of the rows, keyed
    (row membership never changes across runs/partitionings — the
    property a reproducible data pipeline needs, which rand()-based
    sampling lacks)."""
    threshold = int(rate * HASH_MOD)
    return df.filter(hash_bucket(F.col(key)) < F.lit(threshold))


def token_shards(
    docs: DataFrame,
    budget: int = 512,
    text: str = "text",
    key: str = "doc_id",
    substreams: int = 1,
) -> DataFrame:
    """Pack documents into training shards of ~`budget` tokens, first-fit
    in key order per (language, substream). A document belongs to the
    shard its RUNNING token count (exclusive of itself) falls in — the
    deterministic streaming-writer rule. Returns per-shard aggregates
    (lang, substream, shard, n_docs, n_tokens)."""
    t = F.col(text)
    scored = docs.select(
        F.col(key),
        textops.lang_id_expr(t).alias("lang"),
        F.pmod(F.col(key), F.lit(substreams)).alias("substream"),
        textops.token_count(t).cast("long").alias("n"),
    )
    w = (
        Window.partitionBy("lang", "substream")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = scored.withColumn(
        "shard",
        F.floor(F.coalesce(F.sum("n").over(w), F.lit(0)) / F.lit(float(budget))),
    )
    return packed.groupBy("lang", "substream", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("n_tokens")
    )


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Composed curation pass: exact-dedup (keeper = min key per
    md5(normalized text)) → quality floor → per-language doc/token
    totals. The end-to-end shape of a pretraining corpus build, as one
    declarative plan Catalyst can pipeline."""
    norm = normalize_text(F.col(text))
    # keeper selection as ONE digest-keyed window (min id per md5 group):
    # the corpus crosses exactly one shuffle; the groupBy+self-join form
    # would shuffle the text twice (once by digest, once by id for the
    # keeper join — the keeper set is corpus-sized, never broadcastable)
    w = Window.partitionBy(F.md5(norm))
    kept = (
        docs.withColumn("_min_id", F.min(key).over(w))
        .filter(F.col(key) == F.col("_min_id"))
        .drop("_min_id")
    )
    t = F.col(text)
    scored = kept.select(
        textops.lang_id_expr(t).alias("lang"),
        textops.token_count(t).cast("long").alias("n"),
        textops.quality_score(t).alias("q"),
    )
    return (
        scored.filter(F.col("q") >= F.lit(min_quality))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("n_tokens"))
    )


def mixture_sample(
    df: DataFrame,
    rates: dict,
    key: str = "doc_id",
    source: str = "source",
    default_rate: float = 0.0,
) -> DataFrame:
    """Domain-mixture sampling: each source keeps a deterministic
    ~rate share of its rows (the pretraining data-mixing primitive —
    upsample curated domains, downsample crawl). Same portable keyed
    hash as hash_sample, with a per-source threshold: still one narrow
    filter, no shuffle, membership stable across runs and engines."""
    thr = F.lit(int(default_rate * HASH_MOD))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(source) == s, F.lit(int(r * HASH_MOD))).otherwise(thr)
    return df.filter(hash_bucket(F.col(key)) < thr)


def stratified_sample(
    df: DataFrame,
    quota: int,
    group: str = "lang",
    key: str = "doc_id",
) -> DataFrame:
    """Exact per-group quotas: the `quota` rows with the smallest
    portable hash per `group` (deterministic across runs, partitionings,
    and engines — the reproducible alternative to sampleBy, which is
    rate-based and RNG-seeded per partition).

    Two-phase so the per-group rank never sees the full table: a NARROW
    partition-local top-`quota`-per-group pass first (selection by the
    same (hash, key) total order is associative, so no global winner can
    be eliminated locally), then the exact row_number rank over at most
    partitions·quota rows per group. The final semi-join carries only
    winner keys; the wide row never shuffles.
    """
    import pandas as pd

    from pyspark.sql.window import Window

    slim = df.select(
        F.col(group).alias("_g"),
        hash_bucket(F.col(key)).alias("_h"),
        F.col(key).alias("_k"),
    )

    def reduce_part(batches):
        acc = None
        for pdf in batches:
            both = pdf if acc is None else pd.concat((acc, pdf))
            acc = (
                both.sort_values(["_h", "_k"])
                .groupby("_g", sort=False)
                .head(quota)
            )
        if acc is not None:
            yield acc

    reduced = slim.mapInPandas(reduce_part, schema=slim.schema)
    w = Window.partitionBy("_g").orderBy("_h", "_k")
    winners = (
        reduced.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= quota)
        .select("_k")
    )
    return df.join(F.broadcast(winners), df[key] == winners["_k"]).drop("_k")


def sql_stratified_sample(
    quota: int, cols: str, group: str = "lang", key: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`stratified_sample` over `documents`."""
    return f"""
    SELECT {cols} FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY {group}
               ORDER BY ({key} * {HASH_MULT}) % {HASH_MOD}, {key}) AS _r
      FROM documents
    ) WHERE _r <= {quota}
    """


def shard_payloads(
    docs: DataFrame,
    budget: int = 512,
    text: str = "text",
    key: str = "doc_id",
    substreams: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Materialize the packed training shards: per (lang, substream,
    shard), documents concatenated in key order — the actual sequence a
    trainer reads. One aggregation over the packed assignment; the
    in-group order is pinned by sorting the collected (key, text) structs,
    so output is deterministic under any partitioning. Shard payload size
    is bounded by the token budget, so collect_list never exceeds
    ~budget tokens per group."""
    t = F.col(text)
    scored = docs.select(
        F.col(key),
        t.alias("_text"),
        textops.lang_id_expr(t).alias("lang"),
        F.pmod(F.col(key), F.lit(substreams)).alias("substream"),
        textops.token_count(t).cast("long").alias("n"),
    )
    w = (
        Window.partitionBy("lang", "substream")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = scored.withColumn(
        "shard",
        F.floor(F.coalesce(F.sum("n").over(w), F.lit(0)) / F.lit(float(budget))),
    )
    collected = packed.groupBy("lang", "substream", "shard").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(key).alias("k"), F.col("_text").alias("t")))
        ).alias("docs"),
        F.sum("n").alias("n_tokens"),
    )
    payload = F.array_join(
        F.transform(F.col("docs"), lambda d: d["t"]), sep
    )
    return collected.select(
        "lang", "substream", "shard",
        F.size("docs").alias("n_docs"),
        "n_tokens",
        payload.alias("payload"),
    )
