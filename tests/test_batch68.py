"""Batch-68 tests: purity consistency with lang-id, trigram math."""

from collections import defaultdict

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_lang_purity_consistent_with_lang_id(spark, sf_dir):
    purity = {r.doc_id: r for r in REGISTRY["q_lang_purity"].spark(spark, sf_dir).collect()}
    lang = {r.doc_id: r.lang_guess for r in REGISTRY["q_lang_id"].spark(spark, sf_dir).collect()}
    assert set(purity) == set(lang)
    for d, r in purity.items():
        assert 0 <= r.best <= r.total_votes
        assert 0.0 <= r.purity <= 1.0
        if r.total_votes == 0:
            assert lang[d] == "und" and r.mixed == 0
        else:
            assert r.mixed == int(r.best / r.total_votes < 0.8)


def test_behavior_trigrams_math(spark, sf_dir):
    ev = sorted(
        read_events(spark, sf_dir)
        .select("user_id", F.unix_micros("ts").alias("us"), "event_type", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    tri = defaultdict(int)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r.event_type)
    for seq in by_user.values():
        for i in range(len(seq) - 2):
            tri[(seq[i], seq[i + 1], seq[i + 2])] += 1
    expected = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [((r.a, r.b, r.c), r.n) for r in REGISTRY["q_behavior_trigrams"].spark(spark, sf_dir).collect()]
    assert got == expected
