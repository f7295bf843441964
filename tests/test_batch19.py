"""Batch-19 operator tests: geohash vs a pure-Python reference encoder,
char entropy vs collections.Counter math, equi-depth bucket balance."""

import math
from collections import Counter

from pyspark.sql import functions as F

from arrow_supercluster_spark.plans.registry import REGISTRY

GH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"


def ref_geohash(lng: float, lat: float, precision: int = 6) -> str:
    """Textbook geohash bisection encoder (public algorithm) — independent
    of the bit-interleave form the operator uses."""
    lng_lo, lng_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lng_lo + lng_hi) / 2
            if lng >= mid:
                ch = (ch << 1) | 1
                lng_lo = mid
            else:
                ch <<= 1
                lng_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GH_ALPHA[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_matches_bisection_reference(spark, sf_dir):
    rows = REGISTRY["q_geohash_encode"].spark(spark, sf_dir).collect()
    assert rows
    pts = {
        r.id: (r.lng, r.lat)
        for r in REGISTRY["q_scan_points"].spark(spark, sf_dir).collect()
        if r.lng is not None
    }
    mismatch = 0
    for r in rows:
        lng, lat = pts[r.id]
        if ref_geohash(lng, lat) != r.geohash:
            # the scaled-integer form can differ from bisection only when a
            # coordinate sits within float error of a cell wall; none of the
            # LCG-derived points do
            mismatch += 1
    assert mismatch == 0


def test_geohash_prefix_locality(spark, sf_dir):
    """Same 6-char cell ⇒ coords within the precision-6 cell extent."""
    df = REGISTRY["q_geohash_encode"].spark(spark, sf_dir)
    pts = REGISTRY["q_scan_points"].spark(spark, sf_dir).select("id", "lng", "lat")
    j = df.join(pts, "id")
    agg = (
        j.groupBy("geohash")
        .agg(
            (F.max("lng") - F.min("lng")).alias("dlng"),
            (F.max("lat") - F.min("lat")).alias("dlat"),
        )
        .agg(F.max("dlng").alias("mlng"), F.max("dlat").alias("mlat"))
        .collect()[0]
    )
    # precision-6 cell: 360/2^15 deg lng, 180/2^15 deg lat
    assert agg.mlng <= 360.0 / 2**15 + 1e-9
    assert agg.mlat <= 180.0 / 2**15 + 1e-9


def test_char_entropy_matches_counter(spark, sf_dir):
    rows = REGISTRY["q_char_entropy"].spark(spark, sf_dir).limit(2000).collect()
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert rows
    for r in rows:
        cnt = Counter(docs[r.doc_id])
        n = sum(cnt.values())
        assert r.n == n
        assert r.n_distinct == len(cnt)
        if n == 0:
            assert r.entropy == 0.0
        else:
            h = math.log2(n) - sum(c * math.log2(c) for c in cnt.values()) / n
            assert abs(r.entropy - h) < 1e-5, (r.doc_id, r.entropy, h)


def test_equidepth_buckets_balanced(spark, sf_dir):
    rows = REGISTRY["q_equidepth_hist"].spark(spark, sf_dir).orderBy("bucket").collect()
    n_total = sum(r.n for r in rows)
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    # each bucket within 2% of n/10 (ties at a cut can move a few rows)
    target = n_total / 10
    for r in rows:
        assert abs(r.n - target) <= max(2, 0.02 * n_total), (r.bucket, r.n, target)
    # bucket value ranges must be ordered and non-overlapping
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo + 1e-9
