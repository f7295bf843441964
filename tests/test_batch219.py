"""Batch-219 tests: python replays of the product-analytics and
rule-quality completions."""

from collections import defaultdict

from pyspark.sql import functions as F


def _user_days(spark, sf_dir):
    from arrow_supercluster_spark.sources.tables import read_events

    return (
        read_events(spark, sf_dir)
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .collect()
    )


def test_stickiness_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext224 import _WAU_DAYS

    ud = _user_days(spark, sf_dir)
    by_day = defaultdict(set)
    for r in ud:
        by_day[r.d].add(r.user_id)
    days = sorted(by_day)
    got = {
        r.day: r
        for r in REGISTRY["q_stickiness"].spark(spark, sf_dir).collect()
    }
    assert set(got) == {str(d) for d in days}
    for d in days:
        wau = {
            r.user_id for r in ud if 0 <= (d - r.d).days < _WAU_DAYS
        }
        row = got[str(d)]
        assert row.dau == len(by_day[d])
        assert row.wau == len(wau)
        assert row.stickiness == round(row.dau / row.wau, 6)
        assert row.dau <= row.wau


def test_arpu_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            F.to_date("ts").alias("d"), "user_id", "event_type", "value"
        )
        .collect()
    )
    per_day = defaultdict(lambda: {"u": set(), "p": set(), "rev": 0})
    for r in rows:
        d = per_day[r.d]
        d["u"].add(r.user_id)
        if r.event_type == "purchase":
            d["p"].add(r.user_id)
            d["rev"] += round(r.value * 100)
    got = {
        r.day: r for r in REGISTRY["q_arpu"].spark(spark, sf_dir).collect()
    }
    for d, agg in per_day.items():
        row = got[str(d)]
        assert row.dau == len(agg["u"])
        assert row.payers == len(agg["p"])
        assert row.rev_cents == agg["rev"]
        assert row.arpu == round(agg["rev"] / (100.0 * len(agg["u"])), 6)
        if agg["p"]:
            # ARPU = ARPPU × paying share (consistency up to rounding)
            assert (
                abs(row.arpu - row.arppu * row.paying_share) < 1e-3
            )


def test_rule_quality_replay(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry import REGISTRY
    from arrow_supercluster_spark.plans.registry_ext224 import (
        _RQ_MIN_SUPPORT,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    users = defaultdict(set)
    for r in rows:
        users[r.user_id].add(r.event_type)
    n = len(users)
    item = defaultdict(int)
    pair = defaultdict(int)
    for types in users.values():
        for t in types:
            item[t] += 1
        for a in types:
            for b in types:
                if a != b:
                    pair[(a, b)] += 1
    got = {
        (r.ante, r.cons): r
        for r in REGISTRY["q_rule_quality"].spark(spark, sf_dir).collect()
    }
    want_keys = {
        k for k, c in pair.items() if c / n >= _RQ_MIN_SUPPORT
    }
    assert set(got) == want_keys
    for (a, b), c in pair.items():
        if (a, b) not in got:
            continue
        row = got[(a, b)]
        conf = c / item[a]
        assert row.support == round(c / n, 6)
        assert row.confidence == round(conf, 6)
        assert row.leverage == round(
            c / n - (item[a] / n) * (item[b] / n), 6
        )
        if c < item[a]:
            assert row.conviction == round(
                (1 - item[b] / n) / (1 - conf), 6
            )
        else:
            assert row.conviction is None
        assert row.rule_jaccard == round(c / (item[a] + item[b] - c), 6)
