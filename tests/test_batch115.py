"""Batch-115 tests: GIF87a/LZW codec — bit-exact roundtrip vs the
closed-form pixel source, dictionary-edge cases, malformed rejection,
and the Spark pipeline."""

import numpy as np
import pytest

from arrow_supercluster_spark.operators import multimodal as mm


def test_gif_roundtrip_bit_exact_many_ids():
    for mid in range(0, 200, 7):
        img = mm.decode_gif(mm.synthesize_gif(mid))
        assert img.dtype == np.uint8
        assert (img == mm.gif_pixels(mid)).all()


def test_gif_code_width_growth_and_dict_reset():
    """96×64 = 6144 pixels pushes the LZW dictionary past 4096 — the
    encoder must emit a CLEAR and rebuild; the decoder must follow."""
    img = mm.decode_gif(mm.synthesize_gif(11, 96, 64))
    assert (img == mm.gif_pixels(11, 96, 64)).all()


def test_gif_compresses():
    """LZW on the structured gradient must actually compress: payload
    smaller than raw indices + header."""
    raw = 32 * 24
    payload = mm.synthesize_gif(3)
    overhead = 13 + 768 + 10 + 1 + 1 + 1  # headers + palette + framing
    assert len(payload) < raw + overhead


def test_gif_malformed_rejection():
    good = mm.synthesize_gif(1)
    with pytest.raises(ValueError):
        mm.decode_gif(b"NOTAGIF" + good[7:])
    with pytest.raises(ValueError):
        mm.decode_gif(good[:20])  # truncated palette
    # truncate inside the sub-blocks
    with pytest.raises(ValueError):
        mm.decode_gif(good[: len(good) - 10])


def test_gif_extension_blocks_skipped():
    """A GIF89a graphic-control extension before the image descriptor
    must be skipped, not fatal."""
    good = mm.synthesize_gif(2)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    hacked = good[: 13 + 768] + ext + good[13 + 768 :]
    img = mm.decode_gif(hacked)
    assert (img == mm.gif_pixels(2)).all()


def test_gif_features_pipeline(spark, sf_dir):
    from arrow_supercluster_spark.plans.registry_ext120 import q_gif_features

    got = {r.media_id: r for r in q_gif_features(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert set(got) == {d.doc_id for d in docs}
    for d in docs[:40]:
        px = mm.gif_pixels(d.doc_id)
        r = got[d.doc_id]
        assert r.ok
        assert (r.width, r.height) == (32, 24)
        assert abs(r.mean_luma - round(float(px.mean()), 4)) < 1e-9
        assert r.min_luma == int(px.min())
        assert r.max_luma == int(px.max())
        assert r.compression_ratio > 0
