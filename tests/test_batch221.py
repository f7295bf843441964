"""Batch-221 tests: python replays of B-cubed and the BIC Bayes
factor."""

import math
from collections import Counter

from pyspark.sql import functions as F


def test_bcubed_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext207 import _spark_cells

    cells, _, _, _ = _spark_cells(spark, sf_dir)
    rows = cells.collect()
    a = Counter()
    b = Counter()
    for r in rows:
        a[r.bucket] += r.nij
        b[r.label] += r.nij
    n = sum(r.nij for r in rows)
    p = sum(r.nij * r.nij / a[r.bucket] for r in rows) / n
    rc = sum(r.nij * r.nij / b[r.label] for r in rows) / n
    row = REGISTRY["q_bcubed"].spark(spark, sf_dir).collect()[0]
    assert row.n_items == n
    assert abs(row.b3_precision - p) < 1e-6
    assert abs(row.b3_recall - rc) < 1e-6
    assert abs(row.b3_f1 - 2 * p * rc / (p + rc)) < 1e-6
    assert 0 < row.b3_precision <= 1 and 0 < row.b3_recall <= 1


def test_bf_bic_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.sources.tables import read_events

    per_user = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("cents")
        )
        .collect()
    )
    arms = {0: [], 1: []}
    for r in per_user:
        arms[r.user_id % 2].append(r.cents)
    allv = arms[0] + arms[1]
    n = len(allv)
    gm = sum(allv) / n
    rss0 = sum((x - gm) ** 2 for x in allv)
    rss1 = 0.0
    for vs in arms.values():
        m = sum(vs) / len(vs)
        rss1 += sum((x - m) ** 2 for x in vs)
    two_log_bf = n * math.log(rss0 / rss1) - math.log(n)
    row = REGISTRY["q_bf_bic"].spark(spark, sf_dir).collect()[0]
    assert row.n_users == n
    assert abs(row.two_log_bf10 - two_log_bf) < 1e-3
    assert abs(row.bf10_bic - math.exp(two_log_bf / 2)) < max(
        1e-4, abs(math.exp(two_log_bf / 2)) * 1e-4
    )
    assert row.favors_null == (math.exp(two_log_bf / 2) < 1.0)
