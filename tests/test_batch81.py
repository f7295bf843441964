"""Batch 81 (round 4) — chunk-level dedup refinements: oracle parity plus
semantic invariants (CDC word conservation + locality, weighted-Jaccard
bounds vs the unweighted form)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from tests.oracle_harness import compare, duck_connection

NAMES = ["q_cdc_chunks", "q_idf_weighted_jaccard"]


def test_batch81_oracle_parity(spark, sf_dir):
    con = duck_connection(sf_dir)
    for name in NAMES:
        qd = REGISTRY[name]
        errs = compare(name, qd.spark(spark, sf_dir), con, qd.sql)
        assert not errs, errs


def test_cdc_chunks_conserve_words(spark, sf_dir):
    """Chunk word counts must sum back to each doc's token count, and
    chunk indexes must be dense 0..k."""
    from arrow_supercluster_spark.operators.dedup import tokenize

    chunks = REGISTRY["q_cdc_chunks"].spark(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(tokenize(F.col("text"))).alias("n_toks")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_words").alias("s"),
        F.max("chunk_idx").alias("mx"),
        F.count(F.lit(1)).alias("k"),
    )
    j = per_doc.join(docs, "doc_id")
    assert j.filter(F.col("s") != F.col("n_toks")).count() == 0
    assert j.filter(F.col("mx") != F.col("k") - 1).count() == 0


def test_cdc_boundaries_are_content_defined(spark):
    """The locality property: duplicating a document's text must
    reproduce the SAME chunk hash sequence twice (boundaries depend only
    on content), and a one-word prefix edit must leave the tail chunks'
    hashes unchanged."""
    from arrow_supercluster_spark.plans.registry_ext86 import q_cdc_chunks
    import tempfile

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
        "omega one two three four five six seven eight nine ten"
    )
    rows = [
        (0, base),
        (1, base + " " + base),          # doubled content
        (2, "EDIT " + base),             # prefix edit
    ]
    d = tempfile.mkdtemp(prefix="cdc_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    got = {}
    for r in q_cdc_chunks(spark, d).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_md5))
    seq = [h for _, h in sorted(got[0])]
    dbl = [h for _, h in sorted(got[1])]
    # the doubled doc's chunk sequence contains the base sequence twice,
    # except at the junction chunk
    assert dbl[: len(seq) - 1] == seq[: len(seq) - 1]
    assert dbl[-(len(seq) - 1):] == seq[1:]
    edit = [h for _, h in sorted(got[2])]
    # tail chunks resynchronize after the edited neighborhood
    assert edit[-(len(seq) - 1):] == seq[1:]


def test_weighted_jaccard_bounded(spark, sf_dir):
    rows = REGISTRY["q_idf_weighted_jaccard"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r.w_jaccard <= 1 + 1e-9
        assert r.b_id == r.a_id + 1
