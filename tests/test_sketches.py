"""Sketch accuracy + connected-components correctness tests."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.dedup import connected_components
from arrow_supercluster_spark.sources.tables import read_events


def test_approx_distinct_within_tolerance(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    approx = {
        r.event_type: r.a
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("a"))
        .collect()
    }
    exact = {
        r.event_type: r.e
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("e"))
        .collect()
    }
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.1 * exact[k]), (
            k, approx[k], exact[k],
        )


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3, clique 10-11-12, isolated edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a_id long, b_id long",
    )
    got = {
        r.node_id: r.component_id for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_path_converges(spark):
    # a path of 40 nodes exercises multi-round label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a_id long, b_id long"
    )
    got = connected_components(pairs).toPandas()
    assert (got.component_id == 0).all()
    assert len(got) == 41


def test_cc_zigzag_chain_logarithmic_rounds(spark):
    """The geo-sweep failure shape: a long path whose node ids are a
    random permutation (labels zig-zag against the path), where static-
    edge min-propagation needs one round PER HOP (a measured probe: 200
    rounds for 200 nodes, with or without label flattening). Edge
    contraction must resolve it in O(log n) rounds — max_iter=12 both
    proves the bound and guards regressions."""
    import random

    rng = random.Random(7)
    ids = list(range(200))
    rng.shuffle(ids)
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(199)], "a_id long, b_id long"
    )
    got = connected_components(pairs, max_iter=12).toPandas()
    assert (got.component_id == 0).all()
    assert len(got) == 200


def test_cc_monotone_chain_flattens_in_few_rounds(spark):
    """The dual failure shape: ids ASCENDING along the path, so every
    merge target k→k-1 is itself mapped — without mapping flattening the
    contraction absorbs only one label per round. Flattening collapses
    the whole chain at once."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "a_id long, b_id long"
    )
    got = connected_components(pairs, max_iter=4).toPandas()
    assert (got.component_id == 0).all()
    assert len(got) == 201


def test_cc_raises_instead_of_returning_unconverged(spark):
    """max_iter is a safety valve, not an answer: exhausting it must
    raise, never return silently-wrong labels (the pre-round-4 bug that
    broke greedy mode='cc' bit-parity at 2M points)."""
    import random

    import pytest

    rng = random.Random(3)
    ids = list(range(64))
    rng.shuffle(ids)
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(63)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_simhash_matches_independent_vote(spark):
    """SimHash exactness: recompute the per-bit majority vote in plain
    Python from Spark's own token hashes (isolating the aggregation and
    bit-packing logic from the hash choice) and compare fingerprints;
    then the metamorphic property — near-identical docs land within a
    small Hamming distance, token-disjoint docs far apart."""
    from arrow_supercluster_spark.operators.dedup import (
        normalize_text,
        simhash_docs,
        tokenize,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),   # one token differs
        (2, "one two three four five six"),          # disjoint
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash_docs(docs, bits=32).collect()}

    tok_hashes = (
        docs.select(
            "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        .select("doc_id", F.xxhash64("tok").alias("h"))
        .collect()
    )
    by_doc = {}
    for r in tok_hashes:
        by_doc.setdefault(r.doc_id, []).append(r.h)
    for did, hs in by_doc.items():
        fp = 0
        for b in range(32):
            votes = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if votes > 0:
                fp += 1 << b
        assert got[did] == fp, did

    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(got[0], got[1]) < ham(got[0], got[2])


def test_cc_zigzag_through_full_lsh_pipeline(spark):
    """End-to-end regression pin for the r4 cc class (VERDICT r4 'Next
    round' #8): the zig-zag chain must survive the FULL near-dup pipeline
    (tokenize → minhash → LSH band join → connected_components), not just
    a hand-built edge list. A sliding-window corpus makes a TEXT
    similarity chain; doc_ids are a random permutation of chain order, so
    component labels zig-zag against the chain — the shape that exhausted
    max_iter under pre-contraction min-propagation. Run at two partition
    counts: the result must be one component rooted at the min id."""
    import random

    from arrow_supercluster_spark.operators import dedup as dd

    rng = random.Random(5)
    perm = list(range(120))
    rng.shuffle(perm)
    toks = [f"w{j}" for j in range(160)]
    rows = [(perm[i], " ".join(toks[i : i + 21])) for i in range(120)]
    for nparts in (3, 11):
        df = spark.createDataFrame(
            rows, "doc_id long, text string"
        ).repartition(nparts)
        pairs = dd.lsh_candidate_pairs(df, pre_dedup=False)
        comp = connected_components(
            pairs.select("a_id", "b_id"), max_iter=12
        ).toPandas()
        assert len(comp) == 120, nparts
        assert (comp.component_id == 0).all(), nparts
