"""Round-3 registry additions, batch 76 — the auto-strategy
decontamination entry point (VERDICT r2 ask #4):

- q_decontam_auto: decontaminate_auto picks broadcast-exact vs
  Bloom-prefilter by the measured eval-gram cardinality; the result is
  path-independent (the bloom path is exactly verified), so the oracle
  is the SAME SQL as q_decontaminate's.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import decontam
from arrow_supercluster_spark.plans.registry import register
from arrow_supercluster_spark.plans.registry_ext import _docs
from arrow_supercluster_spark.plans.registry_ext9 import (
    _EVAL_MOD,
    _NGRAM,
    _SQL_GRAMS,
)


@register(
    "q_decontam_auto",
    f"""
    WITH grams AS ({_SQL_GRAMS}),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0
    )
    SELECT d.doc_id, COUNT(*) AS n_overlap
    FROM grams d JOIN eval_grams e USING (g)
    WHERE d.doc_id % {_EVAL_MOD} <> 0
    GROUP BY 1
    """,
)
def q_decontam_auto(spark, sf_dir):
    """Pipeline — production decontamination entry: strategy picked by
    eval-gram cardinality (broadcast below the threshold, fixed-size
    Bloom prefilter + exact verify above it — the path SCALING.md
    measured flat at 16× eval while the broadcast went superlinear).
    Same (doc_id, n_overlap) result either way; at this sf the
    broadcast path runs, and tests/test_decontam_auto.py forces the
    bloom path with a tiny threshold and asserts identical output."""
    return decontam.decontaminate_auto(
        _docs(spark, sf_dir),
        eval_pred=F.col("doc_id") % _EVAL_MOD == 0,
        n=_NGRAM,
    )
