"""Batch-20 operator tests: DBSCAN vs a naive numpy/union-find oracle,
partition invariance, constructed-fixture clusters; BPE-encode bounds and
a pure-Python re-encode spot check."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import numpy as np
from pyspark.sql import functions as F

from arrow_supercluster_spark.operators import bpe
from arrow_supercluster_spark.operators.dbscan import dbscan
from arrow_supercluster_spark.plans.registry import REGISTRY
from arrow_supercluster_spark.sources.points import derived_points

EPS, MINPTS = 2.0, 4


def naive_dbscan(ids, lng, lat, eps=EPS, min_pts=MINPTS):
    """O(n^2) reference: full distance matrix + union-find."""
    n = len(ids)
    d2 = (lng[:, None] - lng[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    nbr = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    core = nbr.sum(axis=1) + 1 >= min_pts

    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        if not core[i]:
            continue
        for j in np.nonzero(nbr[i] & core)[0]:
            ri, rj = find(i), find(int(j))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)

    out = {}
    # component label = min point ID in component
    comp_min = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, ids[i]), ids[i])
    for i in range(n):
        if core[i]:
            out[ids[i]] = ("core", comp_min[find(i)])
    for i in range(n):
        if core[i]:
            continue
        core_nb = [comp_min[find(int(j))] for j in np.nonzero(nbr[i] & core)[0]]
        if core_nb:
            out[ids[i]] = ("border", min(core_nb))
        else:
            out[ids[i]] = ("noise", -1)
    return out


def test_dbscan_matches_naive(spark, sf_dir):
    pts = (
        derived_points(spark, sf_dir)
        .filter(F.col("lng").isNotNull())
        .select("id", "lng", "lat")
    )
    rows = pts.collect()
    ids = np.array([r.id for r in rows])
    lng = np.array([r.lng for r in rows])
    lat = np.array([r.lat for r in rows])
    expected = naive_dbscan(ids, lng, lat)
    got = {r.id: (r.role, r.cluster) for r in dbscan(pts, EPS, MINPTS).collect()}
    assert got == expected


def test_dbscan_partition_invariant(spark, sf_dir):
    pts = (
        derived_points(spark, sf_dir)
        .filter(F.col("lng").isNotNull())
        .select("id", "lng", "lat")
    )
    a = {r.id: (r.role, r.cluster) for r in dbscan(pts, EPS, MINPTS).collect()}
    b = {
        r.id: (r.role, r.cluster)
        for r in dbscan(pts.repartition(7), EPS, MINPTS).collect()
    }
    assert a == b


def test_dbscan_constructed_blobs(spark):
    # blob A: 5 points in a tight cross around (0,0); blob B: 5 around (50,50);
    # one isolated point; one border point hanging 1.5 off blob A's core
    rows = []
    for i, (dx, dy) in enumerate([(0, 0), (0.5, 0), (-0.5, 0), (0, 0.5), (0, -0.5)]):
        rows.append((i, 0.0 + dx, 0.0 + dy))
    for i, (dx, dy) in enumerate([(0, 0), (0.5, 0), (-0.5, 0), (0, 0.5), (0, -0.5)]):
        rows.append((10 + i, 50.0 + dx, 50.0 + dy))
    rows.append((20, -100.0, 70.0))      # isolated -> noise
    # within eps of exactly one core (id 1 at (0.5, 0), d=1.9) and with only
    # that single neighbor itself -> border of cluster 0
    rows.append((21, 2.4, 0.0))
    pts = spark.createDataFrame(rows, "id long, lng double, lat double")
    got = {r.id: (r.role, r.cluster) for r in dbscan(pts, EPS, MINPTS).collect()}
    for i in range(5):
        assert got[i] == ("core", 0)
    for i in range(10, 15):
        assert got[10 + (i - 10)] == ("core", 10)
    assert got[20] == ("noise", -1)
    assert got[21][0] == "border" and got[21][1] == 0


def test_bpe_encode_bounds_and_spot_check(spark, sf_dir):
    enc = {r.doc_id: r for r in REGISTRY["q_bpe_encode"].spark(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, _ = bpe.learn_merges(docs, n_merges=3)
    from arrow_supercluster_spark.operators.dedup import normalize_text

    norm = {
        r.doc_id: r.norm
        for r in docs.select(
            "doc_id", normalize_text(F.col("text")).alias("norm")
        ).collect()
    }
    checked = 0
    for doc_id, r in enc.items():
        words = [w for w in norm[doc_id].split(" ") if w]
        assert r.n_words == len(words)
        total_chars = sum(len(w) for w in words)
        # each merge only shrinks; every word is >= 1 symbol
        assert r.n_words <= r.n_bpe <= total_chars or r.n_words == 0
        if checked < 50:
            n_ref = 0
            for w in words:
                seq = " " + " ".join(w) + " "
                for x, y, _ in merges:
                    seq = seq.replace(f" {x} {y} ", f" {x}{y} ")
                n_ref += len(seq.split())
            assert r.n_bpe == n_ref, doc_id
            checked += 1
    assert checked > 0
