"""Batch-7 operators (registry_ext14): invariants + plan gates."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import graph
from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events
from tests.test_plans import plan_of


def _run(name, spark, sf_dir):
    return REGISTRY[name].spark(spark, sf_dir)


def test_pivot_counts_conserve_events(spark, sf_dir):
    out = _run("q_pivot_counts", spark, sf_dir).cache()
    try:
        ev = read_events(spark, sf_dir)
        assert out.count() == ev.select("user_id").distinct().count()
        total = out.select(
            sum(
                [F.sum(f"n_{t}") for t in
                 ("click", "error", "purchase", "signup", "view")],
                F.lit(0),
            ).alias("s")
        ).collect()[0].s
        assert total == ev.count()
    finally:
        out.unpersist()


def test_kl_nonnegative(spark, sf_dir):
    """Gibbs' inequality: KL ≥ 0 (up to output rounding)."""
    out = _run("q_source_lang_kl", spark, sf_dir)
    assert out.filter(F.col("kl") < -1e-6).count() == 0
    assert out.count() > 0


def test_pagerank_mass_and_invariance(spark, sf_dir):
    """Ranks positive; total mass ≤ 1 (dangling mass is dropped) and
    ≥ (1-d) (the teleport floor); identical result at another partition
    count."""
    ev = read_events(spark, sf_dir).select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
    )
    a = ev.select(F.col("user_id").alias("src"), "event_type", "h")
    b = ev.select(F.col("user_id").alias("dst"), "event_type", "h")
    edges = (
        a.join(b, ["event_type", "h"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    pr = graph.pagerank(edges, iterations=3).cache()
    try:
        assert pr.filter(F.col("rank") <= 0).count() == 0
        mass = pr.agg(F.sum("rank")).collect()[0][0]
        # upper slack: each node's output rank is rounded to 1e-6
        n_nodes = pr.count()
        assert 0.15 - 1e-6 <= mass <= 1.0 + 5e-7 * n_nodes
        again = graph.pagerank(edges.repartition(5), iterations=3)
        assert pr.subtract(again).count() == 0
        assert again.subtract(pr).count() == 0
    finally:
        pr.unpersist()


def test_round2_batch7_plan_gates(spark, sf_dir):
    """Pivot compiles to one partial-aggregable agg (explicit value
    list — no discovery pass); KL's three stat tables broadcast; no
    Python anywhere."""
    plan = plan_of(_run("q_pivot_counts", spark, sf_dir))
    assert "EvalPython" not in plan
    # pivot = Spark's two-phase agg ((user,type) partial → pivotfirst),
    # but counts and totals share it: ONE scan of events, no self-join
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    plan = plan_of(_run("q_source_lang_kl", spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "EvalPython" not in plan


def test_standardize_gives_unit_stats(spark, sf_dir):
    """After z-scoring, every dimension's mean ≈ 0 and sample std ≈ 1
    (within the 1e-6 component rounding)."""
    from arrow_supercluster_spark.operators import centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    z = centroids.standardize(emb).select(
        "vec_id", F.col("z").alias("embedding")
    )
    stats = centroids.dimension_stats(z).collect()
    assert stats
    for r in stats:
        assert abs(r.mu) < 1e-4, r
        assert abs(r.sd - 1.0) < 1e-3, r


def test_standardize_plan_is_narrow(spark, sf_dir):
    """Scaling ships stats as literals: the returned plan has zero
    Exchange and zero Join — a pure scan+project."""
    from arrow_supercluster_spark.operators import centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = plan_of(centroids.standardize(emb))
    assert "Exchange" not in plan and "Join" not in plan
    assert "EvalPython" not in plan
