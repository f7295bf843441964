"""Round-3 plan/efficiency gates:

- q_knn_graph_stats runs its O(n²) scoring kernel exactly ONCE (round 2
  shipped a 5-action count ladder that recomputed it per action — the
  slowest query in the registry by 4×); the returned summary frame must
  read the checkpointed edge set, never re-score.
- q_chi2_independence and q_pr_curve build LAZILY: no Spark job may run
  while the query function constructs its DataFrame (the round-2 forms ran
  driver-side .count()/.collect() ladders during build).
- knn_edges_lsh (production graph constructor) must reach a recall floor
  against the exact kernel, and must not contain an all-pairs join.
"""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import similarity
from arrow_supercluster_spark.plans.registry import REGISTRY


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_knn_graph_stats_single_scoring_pass(spark, sf_dir):
    df = REGISTRY["q_knn_graph_stats"].spark(spark, sf_dir)
    plan = _formatted_plan(df)
    # the cosine kernel (zip_with/aggregate HOFs) must NOT appear in the
    # returned plan — edges come from the checkpointed RDD, scored once
    assert "zip_with" not in plan, "scoring kernel re-runs in summary plan"
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    row = df.collect()[0]
    assert row.n_directed == row.n_nodes * 5
    assert 0.0 <= row.reciprocity <= 1.0


def _build_runs_no_jobs(spark, sf_dir, name):
    """Building the query's DataFrame must not execute any driver-side
    action (collect/count/toPandas/head/localCheckpoint) — the whole query
    is ONE action when the caller finally runs it.  (Job-count probes are
    noisy: parquet schema inference runs harness-internal jobs.)"""
    import pyspark.sql.dataframe as dfmod

    actions = ["collect", "count", "toPandas", "head", "take", "first",
               "localCheckpoint", "checkpoint"]
    saved = {a: getattr(dfmod.DataFrame, a) for a in actions}

    def _boom(action):
        def inner(self, *a, **k):
            raise AssertionError(f"{name} ran .{action}() during build")
        return inner

    try:
        for a in actions:
            setattr(dfmod.DataFrame, a, _boom(a))
        df = REGISTRY[name].spark(spark, sf_dir)
    finally:
        for a, fn in saved.items():
            setattr(dfmod.DataFrame, a, fn)
    return df


def test_chi2_builds_lazily(spark, sf_dir):
    df = _build_runs_no_jobs(spark, sf_dir, "q_chi2_independence")
    row = df.collect()[0]
    assert row.n_cells > 0 and row.dof > 0


def test_pr_curve_builds_lazily(spark, sf_dir):
    df = _build_runs_no_jobs(spark, sf_dir, "q_pr_curve")
    rows = df.collect()
    assert len(rows) == 9


def test_knn_edges_lsh_recall_floor(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select(
        "vec_id", similarity.as_double(F.col("embedding")).alias("v")
    )
    exact = set(
        (r.src, r.dst)
        for r in similarity.knn_edges_exact(e, k=5, vec="v", key="vec_id").collect()
    )
    # (4 planes, 8 tables): measured recall 0.68 at sf0.001 with ~half the
    # all-pairs candidate count; (3, 16) reaches 0.98 but candidates exceed
    # n² at this corpus size — the knobs trade recall for Σ bucket² cost
    approx = set(
        (r.src, r.dst)
        for r in similarity.knn_edges_lsh(
            e, k=5, vec="v", key="vec_id", n_planes=4, n_tables=8
        ).collect()
    )
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH knn recall {recall:.2f} below floor"
    # production path: candidates from bucket equi-joins, never all-pairs
    plan = _formatted_plan(
        similarity.knn_edges_lsh(e, k=5, vec="v", key="vec_id")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
