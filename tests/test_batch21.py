"""Batch-21 multimodal tests: aHash determinism/perturbation, banded
near-dup recall == brute force, FFT peak == synthesized frequency."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


import numpy as np
import pandas as pd

from arrow_supercluster_spark.operators import multimodal as mm
from arrow_supercluster_spark.plans.registry import REGISTRY


def test_ahash_identical_images_same_hash():
    # textured corpus: structure repeats with period 245 (= 7*35) in the id
    a = mm.ahash64(mm.decode_bmp(mm.synthesize_bmp_textured(7)))
    b = mm.ahash64(mm.decode_bmp(mm.synthesize_bmp_textured(7 + 245)))
    assert a == b
    # different checker frequencies -> different hashes
    c = mm.ahash64(mm.decode_bmp(mm.synthesize_bmp_textured(8)))
    assert a != c


def test_ahash_cancels_uniform_tint():
    # the plain gradient corpus varies only by uniform red tint; a
    # mean-thresholded hash must (and does) collapse those
    a = mm.ahash64(mm.decode_bmp(mm.synthesize_bmp(7)))
    b = mm.ahash64(mm.decode_bmp(mm.synthesize_bmp(123)))
    assert a == b


def test_ahash_small_perturbation_small_distance():
    img = mm.decode_bmp(mm.synthesize_bmp_textured(3))
    h0 = mm.ahash64(img)
    pert = img.copy()
    pert[0, 0] = 255 - pert[0, 0]  # flip one source pixel
    h1 = mm.ahash64(pert)
    d = bin((h0 ^ h1) & (2**64 - 1)).count("1")
    assert d <= 4
    # a very different image should be far
    other = np.zeros_like(img)
    other[:, : img.shape[1] // 2] = 255
    d2 = bin((h0 ^ mm.ahash64(other)) & (2**64 - 1)).count("1")
    assert d2 > 8


def test_banded_neardup_equals_brute_force(spark, sf_dir):
    hashes_df = mm.image_ahash(
        mm.documents_as_textured_images(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    )
    hashes = {r.media_id: r.ahash for r in hashes_df.collect() if r.ok}
    ids = sorted(hashes)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if d <= 3:
                brute.add((a, b, d))
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in mm.ahash_neardup_pairs(hashes_df, max_dist=3, bands=4).collect()
    }
    assert got == brute
    assert brute  # the synthesized corpus does contain identical images


def test_audio_spectral_peak_matches_synthesis(spark, sf_dir):
    rows = REGISTRY["q_audio_spectral"].spark(spark, sf_dir).collect()
    assert rows
    n_checked = 0
    for r in rows:
        assert r.ok
        expected = 200.0 + (r.media_id % 40) * 25.0
        bin_width = mm._WAV_RATE / r.n
        assert abs(r.dominant_hz - expected) <= bin_width + 0.01, (
            r.media_id,
            r.dominant_hz,
            expected,
        )
        # pure sine: centroid near the peak (leakage pulls it slightly)
        assert abs(r.centroid_hz - expected) < expected * 0.5 + 50
        n_checked += 1
    assert n_checked > 0


def test_ahash_quarantines_garbage(spark):
    pdf = pd.DataFrame(
        {"media_id": [1, 2], "payload": [b"not a bmp", mm.synthesize_bmp(2)]}
    )
    media = spark.createDataFrame(pdf)
    rows = {r.media_id: r for r in mm.image_ahash(media).collect()}
    assert rows[1].ok is False and rows[1].ahash is None
    assert rows[2].ok is True and rows[2].ahash is not None
