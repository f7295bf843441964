"""Batch-108 test: partition-skew diagnostic — python oracle."""

from collections import Counter


def test_partition_skew_python_oracle(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext113 import (
        _SKEW_BUCKETS,
        q_partition_skew,
    )

    got = {r.scheme: r for r in q_partition_skew(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for scheme, keyf in (
        ("hash_mod", lambda d: d.doc_id % _SKEW_BUCKETS),
        ("source", lambda d: d.source),
    ):
        n, by = Counter(), Counter()
        for d in docs:
            n[keyf(d)] += 1
            by[keyf(d)] += d.n_chars
        r = got[scheme]
        assert r.n_buckets == len(n)
        assert r.max_rows == max(n.values())
        mean = sum(n.values()) / len(n)
        assert abs(r.mean_rows - round(mean, 4)) < 1e-9
        assert abs(r.skew_factor - round(max(n.values()) / mean, 4)) < 1e-9
        assert r.max_bytes == max(by.values())
        assert r.skew_factor >= 1.0
