"""decontaminate_auto: the strategy switch must be invisible in the
result — broadcast path and forced-bloom path return identical
(doc_id, n_overlap) rows, and the bitmap auto-sizing keeps the bloom
unsaturated as the threshold forces the scaled path."""

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY  # noqa: F401  (fully init the plan modules first)
from arrow_supercluster_spark.operators.decontam import (
    decontaminate,
    decontaminate_auto,
)
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.plans.registry_ext9 import _EVAL_MOD


def _rows(df):
    return sorted((r.doc_id, r.n_overlap) for r in df.collect())


def test_auto_paths_agree(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pred = F.col("doc_id") % _EVAL_MOD == 0
    exact = _rows(decontaminate(docs, pred, n=8))
    # default threshold → broadcast path
    auto_bc = _rows(decontaminate_auto(docs, pred, n=8))
    # threshold 0 → every corpus takes the bloom path
    auto_bloom = _rows(decontaminate_auto(docs, pred, n=8, bloom_threshold=0))
    assert auto_bc == exact
    assert auto_bloom == exact
    assert len(exact) > 0
