"""Physical-plan quality gates — the scale-behavior assertions SURVEY §4
commits to: predicate pushdown reaches the parquet scan, small dimensions
broadcast, hot paths stay JVM-side (no Python row UDFs), partition pruning
hits the zoom-partitioned hierarchy."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from pyspark.sql import functions as F

from arrow_supercluster_spark.config import DEFAULT_OPTIONS as OPTS
from arrow_supercluster_spark.operators import grid_cluster as gc
from arrow_supercluster_spark.plans.registry import REGISTRY


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bbox_filter_pushdown(spark, sf_dir):
    """F4's range predicate must reach the parquet scan (PushedFilters)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(
        (F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)
    ).select("l_orderkey")
    plan = formatted(q)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity" in plan


def test_column_pruning(spark, sf_dir):
    """A 2-column projection must not scan all 11 lineitem columns."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plan = formatted(li.select("l_orderkey", "l_quantity"))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_extendedprice" not in read_schema[0]


def test_join_agg_broadcasts_dimension(spark, sf_dir):
    """q_join_agg's nation join must be a broadcast hash join, not a
    shuffle join."""
    plan = plan_of(REGISTRY["q_join_agg"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_core_queries_have_no_python_udfs(spark, sf_dir):
    """Hot-path queries are whole-stage-codegen JVM plans: any
    BatchEvalPython/ArrowEvalPython node means a Python UDF leaked in."""
    for name in (
        "q_mercator_fwd", "q_cluster_grid_z8", "q_get_clusters_z6",
        "q_lineitem_agg", "q_cosine_topk", "q_dedup_exact", "q_token_counts",
    ):
        plan = plan_of(REGISTRY[name].spark(spark, sf_dir))
        assert "EvalPython" not in plan, name


def test_hierarchy_partition_pruning(spark, sf_dir, tmp_path):
    """Q1 over the materialized hierarchy must prune to one zoom=
    directory (17/18 of the data never read)."""
    from arrow_supercluster_spark.sources.points import derived_points

    nodes = gc.materialize_hierarchy(
        derived_points(spark, sf_dir), str(tmp_path / "h"), OPTS
    )
    q = nodes.filter(F.col("zoom") == 6)
    plan = formatted(q)
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "zoom" in scan[0]


def test_cosine_topk_partial_before_rank(spark, sf_dir):
    """E3's final rank must consume a NARROW per-partition partial top-k,
    not the raw scored set: Spark's WindowGroupLimit rewrite bounds each
    input partition to k rows per query BELOW the Exchange — so the
    shuffle moves O(partitions·k·|q|) rows, never all |corpus|·|q| scored
    pairs into one reducer per query."""
    plan = plan_of(REGISTRY["q_cosine_topk"].spark(spark, sf_dir))
    # WindowGroupLimit must appear twice: the Partial below the Exchange
    # (per-partition top-k before any shuffle) and the Final above it
    assert plan.count("WindowGroupLimit") == 2
    assert plan.count("Exchange hashpartitioning") == 1
    # toString prints root-first: the exchange sits between the two
    # WindowGroupLimits — ancestor of the partial, child of the final
    first = plan.index("WindowGroupLimit")
    second = plan.index("WindowGroupLimit", first + 1)
    ex = plan.index("Exchange hashpartitioning")
    assert first < ex < second
    # scoring itself stays JVM-side (broadcast join, no Python eval)
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_spread_gates_on_input_parallelism(spark, sf_dir):
    """The heavy-text-map repartition must fire only for under-parallel
    input: single-file scan gets a RoundRobin Exchange; an input already
    at >= defaultParallelism partitions keeps its plan Exchange-free."""
    from arrow_supercluster_spark.functions.partitioning import spread

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert "Exchange" in plan_of(spread(docs).select("doc_id"))
    par = spark.sparkContext.defaultParallelism
    wide = docs.repartition(par * 2)
    # spread() of an already-wide input adds nothing: same plan object
    assert spread(wide) is wide


def test_grid_cluster_single_exchange(spark, sf_dir):
    """A1-grid at one zoom = scan → project → ONE exchange (hash agg with
    partial aggregation); more exchanges would mean a redundant shuffle."""
    from arrow_supercluster_spark.sources.points import derived_points

    plan = plan_of(gc.cluster_grid(derived_points(spark, sf_dir), 8, OPTS))
    assert plan.count("Exchange") == 1
    assert "HashAggregate" in plan


def test_round2_batch3_plan_gates(spark, sf_dir):
    """Scale-shape gates for the batch-3 operators: global top-ks are
    TakeOrderedAndProject (per-partition k, driver merge — no full sort,
    no hot reducer), marginals/stats ride as broadcasts, and nothing
    drops to Python in the hot path."""
    for name in ("q_bm25_search", "q_weighted_sample", "q_collocations"):
        plan = plan_of(REGISTRY[name].spark(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, name
        assert "EvalPython" not in plan, name
    # collocations: unigram marginals + both scalar totals broadcast
    plan = plan_of(REGISTRY["q_collocations"].spark(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("BroadcastNestedLoopJoin") >= 2  # 1-row scalar totals
    # unigram LM: scoring plan is a narrow scan — zero Exchange
    plan = plan_of(REGISTRY["q_unigram_logprob"].spark(spark, sf_dir))
    assert "Exchange" not in plan
    # chunking: pure generator, zero Exchange
    plan = plan_of(REGISTRY["q_doc_chunks"].spark(spark, sf_dir))
    assert "Exchange" not in plan


def test_bloom_probe_broadcasts_bitmap(spark, sf_dir):
    """The bloom prefilter's bucket join must be a BroadcastHashJoin
    (the bitmap is fixed-size by construction) and the plan must contain
    no cartesian/nested-loop join."""
    from arrow_supercluster_spark.operators import bloomfilter
    from arrow_supercluster_spark.operators.decontam import doc_ngram_digests

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    grams = doc_ngram_digests(docs, 8)
    eval_g = grams.filter(F.col("doc_id") % 29 == 0).select("g").distinct()
    bloom = bloomfilter.bloom_build(eval_g, "g", m_bits=1 << 17, k=4)
    probe = bloomfilter.bloom_prefilter(
        grams, "g", bloom, m_bits=1 << 17, k=4
    )
    plan = plan_of(probe)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_no_global_cross_join(spark, sf_dir):
    """SemDeDup's pair join must be keyed on the cell id — no cartesian
    product, no nested-loop join of the full corpus."""
    from arrow_supercluster_spark.operators import centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = plan_of(centroids.semantic_dedup(emb, k=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_attribution_join_is_equi_keyed(spark, sf_dir):
    """The attribution join must hash on user_id (equi key) with the
    time bound as a residual condition, not degrade to a nested loop."""
    q = REGISTRY["q_view_purchase_attribution"].spark(spark, sf_dir)
    plan = plan_of(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_group_topk_partial_window_limit(spark, sf_dir):
    """q_group_topk must get the WindowGroupLimit split (partial
    per-partition top-k below the Exchange + final above it), so no
    group's full membership lands on one reducer."""
    q = REGISTRY["q_group_topk"].spark(spark, sf_dir)
    assert plan_of(q).count("WindowGroupLimit") == 2
