"""Batch-31 tests: BFS hop correctness vs pure-Python BFS, readability
bounds, Fano factor vs numpy."""

from collections import defaultdict, deque

import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.tables import read_events


def test_bfs_matches_python(spark, sf_dir):
    ev = read_events(spark, sf_dir).select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("h")
    ).collect()
    by_key = defaultdict(set)
    for r in ev:
        by_key[(r.event_type, r.h)].add(r.user_id)
    adj = defaultdict(set)
    for users in by_key.values():
        for u in users:
            for v in users:
                if u != v:
                    adj[u].add(v)
    nodes = set(adj)
    seeds = [n for n in nodes if n % 50 == 0]
    dist = {s: 0 for s in seeds}
    frontier = deque(seeds)
    while frontier:
        u = frontier.popleft()
        if dist[u] >= 3:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                frontier.append(v)
    got = {r.node: r.hops for r in REGISTRY["q_bfs_hops"].spark(spark, sf_dir).collect()}
    assert got == dist


def test_readability_bounds(spark, sf_dir):
    rows = REGISTRY["q_readability"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_sent >= 1 and r.n_words >= 1
        assert r.words_per_sent >= 1.0 or r.n_words == 1
        assert 0.0 <= r.chars_per_word < 40
        # formula consistency
        expect = 206.835 - 1.015 * r.words_per_sent - 84.6 * (r.chars_per_word / 3.0)
        assert abs(r.flesch_proxy - expect) < 1e-4


def test_fano_matches_numpy(spark, sf_dir):
    ev = read_events(spark, sf_dir).select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in ev:
        counts[r.event_type][r.h] += 1
    got = {r.event_type: r for r in REGISTRY["q_fano_dispersion"].spark(spark, sf_dir).collect()}
    for et, hours in counts.items():
        ns = np.array(list(hours.values()), dtype=float)
        r = got[et]
        assert r.n_hours == len(ns)
        assert abs(r.mean_n - ns.mean()) < 1.01e-6
        assert abs(r.var_n - ns.var(ddof=1)) < 1.01e-5
        assert abs(r.fano - ns.var(ddof=1) / ns.mean()) < 1.01e-5
