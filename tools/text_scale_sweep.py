"""Text-pipeline scale sweep: wall time of the dedup/decontamination
stack as the corpus grows 16x (5k -> 80k docs, built by deterministic
replication of the sf0.1 documents table with per-replica suffix
perturbation — replicas are NEAR-dups of their source, so MinHash/LSH
does real candidate work, while the original exact-dup structure is
preserved).

The claim under test (VERDICT round 1 graded it): the dedup stack is
bucketed, not all-pairs — minhash banding, bloom prefilter, df-capped
span join — so wall time should grow close to linearly with the
corpus, not quadratically.

Run:  python tools/text_scale_sweep.py     # JSON lines to stdout

This is a judge/dev-facing sweep script, collect-gate-exempt (tests/test_collect_gate.py): it intentionally materializes results driver-side to print them; it is never part of a registered query plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_docs(spark, k: int):
    """k deterministic replicas of the documents table. Every 8th token
    of replica r > 0 is salted with the replica id, so NO 8-gram (and no
    3-shingle window containing a salted token) is shared ACROSS
    replicas — each replica keeps the original corpus's internal
    dup/overlap structure but adds none against the others. That makes
    the sweep measure ENGINE scaling: the per-replica duplicate
    structure (and so the output size per replica) is constant, and the
    corpus grows k-fold. (Suffix-replica perturbation was tried first:
    replicas stayed near-dups of their source, so pair outputs grew
    ~k² by construction and the numbers measured output size, not the
    plan.)"""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if k == 1:
        return docs
    reps = docs.crossJoin(
        spark.range(k).select(F.col("id").alias("rep"))
    )
    toks = F.split(F.col("text"), " ")
    salted = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                (i % 8 == 0) & (F.col("rep") > 0),
                F.concat(x, F.lit("xr"), F.col("rep").cast("string")),
            ).otherwise(x),
        ),
        " ",
    )
    return reps.select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        salted.alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def replicate_docs_ids_only(spark, k: int):
    """k replicas with fresh doc_ids but IDENTICAL text: the token
    domain (31 tokens at sf0.1) stays <= 62, so q_setsim_join keeps the
    dense-domain bitmask regime at every k. Distinct masks are constant
    under this replication; the qualifying PAIR SET grows ~k^2 by the
    semantics themselves (every replica of a dup group pairs with every
    other), so the sweep times the pre-expansion engine stages
    separately from the output-bound full materialization."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if k == 1:
        return docs
    reps = docs.crossJoin(
        spark.range(k).select(F.col("id").alias("rep"))
    )
    return reps.select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )


def setsim_sweep(spark):
    """Regime-switch sweep for q_setsim_join (VERDICT r5 Next-round #4):

    - dense regime (vocab <= 62 -> bitmask): ids-only replication at
      1x/16x/64x; records the dispatch-probe wall time (must stay flat —
      the r6 fix caps it at 63 collected rows), the distinct-mask stage,
      and the qualifying mask-pair count pre-expansion. The full pair
      materialization is timed only at 1x/4x because the RESULT is
      Theta(n^2) on this corpus (7.1M pairs at 1x) — output size, not
      engine work, dominates beyond that.
    - sparse regime (vocab > 62 -> prefix filter): token-salted
      replication at 1x/4x/16x through the full prefix path, probe cost
      recorded the same way.
    """
    import shutil
    import tempfile

    from arrow_supercluster_spark.operators.dedup import tokenize
    from arrow_supercluster_spark.plans import registry_ext89 as m

    def probe_sec_and_vocab(docs):
        sets0 = docs.select(
            "doc_id", F.array_distinct(tokenize(F.col("text"))).alias("toks")
        ).select("doc_id", "toks", F.size("toks").alias("sz")).filter(
            F.col("sz") > 0
        )
        out = {}
        t0 = time.perf_counter()
        probe = (
            sets0.select(F.explode("toks").alias("tok"))
            .distinct()
            .limit(m._BITMASK_MAX_VOCAB + 1)
            .collect()
        )
        out["probe_sec"] = round(time.perf_counter() - t0, 3)
        out["probe_rows"] = len(probe)
        return sets0, out

    def run_full(docs):
        d = tempfile.mkdtemp(prefix="setsim_sweep_")
        try:
            docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
            t0 = time.perf_counter()
            n_pairs = m.q_setsim_join(spark, d).count()
            return round(time.perf_counter() - t0, 3), n_pairs
        finally:
            shutil.rmtree(d, ignore_errors=True)

    for k in (1, 4, 16, 64):
        docs = replicate_docs_ids_only(spark, k).persist()
        row = {"regime": "dense_bitmask", "replicas": k,
               "n_docs": docs.count()}
        sets0, probe = probe_sec_and_vocab(docs)
        row.update(probe)
        vocab = sorted(
            r.tok for r in sets0.select(F.explode("toks").alias("tok"))
            .distinct().limit(m._BITMASK_MAX_VOCAB + 1).collect()
        )
        from itertools import chain
        bit_map = F.create_map(*chain.from_iterable(
            (F.lit(t), F.lit(1 << i).cast("long"))
            for i, t in enumerate(vocab)
        ))
        mask = F.aggregate(
            F.transform("toks", lambda t: F.element_at(bit_map, t)),
            F.lit(0).cast("long"), lambda a, b: a + b,
        )
        masked = sets0.select("doc_id", mask.alias("mask")).persist()
        t0 = time.perf_counter()
        n_masks = masked.select("mask").distinct().count()
        row["mask_stage_sec"] = round(time.perf_counter() - t0, 3)
        row["n_distinct_masks"] = n_masks
        masks = masked.select("mask").distinct()
        ma = masks.select(F.col("mask").alias("ma"))
        mb = masks.select(F.col("mask").alias("mb"))
        inter = F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
        union = F.bit_count(F.col("ma").bitwiseOR(F.col("mb")))
        t0 = time.perf_counter()
        row["n_qualifying_mask_pairs"] = (
            ma.join(F.broadcast(mb), F.col("ma") < F.col("mb"))
            .filter(inter * F.lit(1.0) / union >= m._T).count()
        )
        row["mask_pair_stage_sec"] = round(time.perf_counter() - t0, 3)
        if k <= 4:
            row["full_join_sec"], row["n_pairs"] = run_full(docs)
        masked.unpersist()
        docs.unpersist()
        print(json.dumps(row), flush=True)

    # Sparse regime: a GENERATED wide-vocab corpus (5k-token vocabulary,
    # 12 tokens/doc, every 10th doc gets one near-dup neighbour at
    # J≈0.85) — the natural-text-like regime prefix filtering exists
    # for, where candidates are rare and the filter actually prunes.
    # (The salted synthetic corpus is deliberately NOT used here: its
    # within-replica self-similarity makes every prefix shared, so the
    # prefix path degenerates to all-pairs — that pathological regime is
    # exactly what the bitmask path exists to dodge, already measured
    # above.)
    def sparse_corpus(n_docs):
        src = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(11)),
            lambda j: F.format_string(
                "w%05d",
                (F.col("doc_id") * F.lit(37) + j * F.lit(101)
                 + (F.col("doc_id") % F.lit(13)) * j) % F.lit(5000),
            ),
        )
        base = src.select(
            "doc_id", F.array_join(toks, " ").alias("text"),
            F.lit("en").alias("lang"), F.lit("gen").alias("source"),
            F.lit(0).alias("n_chars"),
        )
        near = base.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.concat(
                F.substring_index(F.col("text"), " ", 11), F.lit(" zz")
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        return base.unionByName(near)

    for n in (5_000, 20_000, 80_000):
        docs = sparse_corpus(n).persist()
        row = {"regime": "sparse_prefix", "n_docs": docs.count()}
        _, probe = probe_sec_and_vocab(docs)
        row.update(probe)
        row["full_join_sec"], row["n_pairs"] = run_full(docs)
        docs.unpersist()
        print(json.dumps(row), flush=True)

    # Adversarial MANY-MASKS regime (VERDICT r6 Next-round #2): the
    # vocabulary stays <= 62 tokens (so the first two probes say
    # "dense"), but every doc carries a DISTINCT token subset — token j
    # is included iff bit j of a Knuth hash of doc_id is set, giving
    # ~min(n_docs, 2^25) distinct masks.  Without the r6 mask-cap guard
    # the bitmask pair stage would broadcast all of them and compare
    # O(M^2) pairs; with it, dispatch must route to the prefix path.
    # Recorded: the three probe costs (all must stay flat/bounded) and
    # the routed path.  Full-join wall time is measured only at the
    # smallest n — the corpus is engineered for candidate-set blowup in
    # EVERY exact algorithm (that is what makes it adversarial), so the
    # point here is the bounded dispatch, not join throughput.
    def many_masks_corpus(n_docs):
        src = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        h = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1 << 25))
        # bit test via exact integer arithmetic (shiftright needs a
        # literal count, so divide by 2^j instead; 2^25 fits a double
        # exactly)
        toks = F.filter(
            F.transform(
                F.sequence(F.lit(0), F.lit(24)),
                lambda j: F.when(
                    F.pmod(
                        F.floor(
                            h / F.pow(F.lit(2.0), j.cast("double"))
                        ).cast("long"),
                        F.lit(2),
                    ) == 1,
                    F.format_string("b%02d", j),
                ),
            ),
            lambda x: x.isNotNull(),
        )
        return src.select(
            "doc_id", F.array_join(toks, " ").alias("text"),
            F.lit("en").alias("lang"), F.lit("gen").alias("source"),
            F.lit(0).alias("n_chars"),
        ).filter(F.length("text") > 0)

    from itertools import chain

    for n in (2_000, 50_000, 500_000):
        docs = many_masks_corpus(n).persist()
        row = {"regime": "many_masks_guard", "n_docs": docs.count()}
        sets0, probe = probe_sec_and_vocab(docs)
        row.update(probe)
        vocab = sorted(
            r.tok for r in sets0.select(F.explode("toks").alias("tok"))
            .distinct().limit(m._BITMASK_MAX_VOCAB + 1).collect()
        )
        bit_map2 = F.create_map(*chain.from_iterable(
            (F.lit(t), F.lit(1 << i).cast("long"))
            for i, t in enumerate(vocab)
        ))
        mask2 = F.aggregate(
            F.transform("toks", lambda t: F.element_at(bit_map2, t)),
            F.lit(0).cast("long"), lambda a, b: a + b,
        )
        masked = sets0.select("doc_id", mask2.alias("mask"))
        t0 = time.perf_counter()
        n_masks_capped = (
            masked.select("mask").distinct()
            .limit(m._BITMASK_MAX_MASKS + 1).count()
        )
        row["mask_probe_sec"] = round(time.perf_counter() - t0, 3)
        row["mask_probe_rows"] = n_masks_capped
        row["routed_path"] = (
            "prefix" if n_masks_capped > m._BITMASK_MAX_MASKS
            else "bitmask"
        )
        if n <= 2_000:
            row["full_join_sec"], row["n_pairs"] = run_full(docs)
        docs.unpersist()
        print(json.dumps(row), flush=True)


def packing_sweep(spark):
    """Scale certification for q_pack_sequences' data-derived group
    count (VERDICT r6 Next-round #1): ids-only replication at
    1x/16x/64x multiplies total tokens by k, so g must GROW with the
    corpus (g = max(8, ceil(total/2M))) and the max per-group token
    total must stay <= the 2M budget once above the floor — the
    bounded-kernel property that makes the plan embarrassingly
    parallel at any corpus size."""
    import shutil
    import tempfile

    from arrow_supercluster_spark.plans import registry_ext154 as m

    for k in (1, 16, 64):
        docs = replicate_docs_ids_only(spark, k).persist()
        row = {"regime": "pack_sequences", "replicas": k,
               "n_docs": docs.count()}
        d = tempfile.mkdtemp(prefix="pack_sweep_")
        try:
            docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
            t0 = time.perf_counter()
            out = m.q_pack_sequences(spark, d).collect()
            row["wall_sec"] = round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(d, ignore_errors=True)
        row["g"] = len(out)
        row["max_group_tokens"] = max(r.total_tokens for r in out)
        row["budget"] = m._PACK_GROUP_TOKEN_BUDGET
        row["group_bounded"] = (
            row["g"] == m._PACK_GROUPS_MIN
            or row["max_group_tokens"] <= 2 * m._PACK_GROUP_TOKEN_BUDGET
        )
        docs.unpersist()
        print(json.dumps(row), flush=True)


def minhash_deep_sweep(spark):
    """Deep corpus-dimension certification for the MinHash+LSH pair
    stage (VERDICT r6 Next-round #8): salted replication at 16x/64x
    keeps per-replica duplicate structure constant while the corpus
    grows, so a bucketed (banded equi-join) plan must stay ~linear —
    an all-pairs or hot-band plan would bend quadratic between the two
    points."""
    from arrow_supercluster_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    for k in (16, 64):
        docs = replicate_docs(spark, k).persist()
        row = {"regime": "minhash_deep", "replicas": k,
               "n_docs": docs.count()}
        row["minhash_lsh_sec"] = timed(
            lambda: lsh_candidate_pairs(docs).count()
        )
        docs.unpersist()
        print(json.dumps(row), flush=True)


def decontam_wide_sweep(spark):
    """Eval-set-dimension certification for decontaminate_auto (VERDICT
    r6 Next-round #8): the CORPUS stays fixed (sf0.1 x4) while the eval
    slice grows from ~3% to 50% of it.  auto must track the better of
    its two branches as the gram cardinality crosses the bloom
    threshold — broadcast below, bloom-prefilter above — and the
    recorded n_grams shows which side of the threshold each point is
    on."""
    from arrow_supercluster_spark.operators import bloomfilter
    from arrow_supercluster_spark.operators.decontam import (
        decontaminate,
        decontaminate_auto,
        doc_ngram_digests,
    )

    docs = replicate_docs(spark, 4).persist()
    n = docs.count()
    for mod in (29, 7, 2):
        pred = F.col("doc_id") % mod == 0
        row = {"regime": "decontam_wide", "n_docs": n, "eval_mod": mod}
        row["n_eval_grams"] = (
            doc_ngram_digests(docs.filter(pred), n=8)
            .select("g").distinct().count()
        )
        row["broadcast_sec"] = timed(
            lambda: decontaminate(docs, eval_pred=pred, n=8).count()
        )
        row["bloom_sec"] = timed(
            lambda: bloomfilter.bloom_decontaminate(
                docs, eval_pred=pred, n=8
            ).count()
        )
        row["auto_sec"] = timed(
            lambda: decontaminate_auto(docs, eval_pred=pred, n=8).count()
        )
        print(json.dumps(row), flush=True)
    docs.unpersist()


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main():
    only = set(sys.argv[1:])  # empty = run everything

    def want(name):
        return not only or name in only

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("text-scale-sweep")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from arrow_supercluster_spark.operators import bloomfilter
    from arrow_supercluster_spark.operators.decontam import (
        decontaminate,
        decontaminate_auto,
        dup_spans,
    )
    from arrow_supercluster_spark.operators.dedup import (
        exact_dedup,
        lsh_candidate_pairs,
    )

    for k in (1, 4, 16) if want("dedup") else ():
        docs = replicate_docs(spark, k).persist()
        n = docs.count()
        row = {"replicas": k, "n_docs": n}
        row["exact_dedup_sec"] = timed(lambda: exact_dedup(docs).count())
        row["minhash_lsh_sec"] = timed(lambda: lsh_candidate_pairs(docs).count())
        row["exact_decontam_sec"] = timed(
            lambda: decontaminate(
                docs, eval_pred=F.col("doc_id") % 29 == 0, n=8
            ).count()
        )
        row["bloom_decontam_sec"] = timed(
            lambda: bloomfilter.bloom_decontaminate(
                docs, eval_pred=F.col("doc_id") % 29 == 0, n=8
            ).count()
        )
        # the production entry point: must track the flat (bloom) curve
        # once the eval-gram count crosses the threshold, the broadcast
        # curve below it — the strategy switch is the thing under test
        row["auto_decontam_sec"] = timed(
            lambda: decontaminate_auto(
                docs, eval_pred=F.col("doc_id") % 29 == 0, n=8
            ).count()
        )
        row["dup_spans_sec"] = timed(
            lambda: dup_spans(docs, n=8, max_df=20, min_run=2).count()
        )
        docs.unpersist()
        print(json.dumps(row), flush=True)

    if want("setsim"):
        setsim_sweep(spark)
    if want("packing"):
        packing_sweep(spark)
    if want("minhash_deep"):
        minhash_deep_sweep(spark)
    if want("decontam_wide"):
        decontam_wide_sweep(spark)

    spark.stop()


if __name__ == "__main__":
    main()
