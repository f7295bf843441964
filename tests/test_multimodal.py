"""Multimodal plumbing checks against in-repo pandas references: the
Spark-side schema/batching is real even though decode is stubbed (no
media libraries in the container)."""

# Timing tier (r11, VERDICT r10 "Next round" #2): this module's Spark
# work put it above the 8 s cut in the measured full-suite profile, so it
# is excluded from the DEFAULT pytest run (pyproject addopts -m 'not
# slow') to keep that run inside the driver's budget.  The full suite
# (tools/shard_tests.py, or pytest -m '') still runs it.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow


from pyspark.sql import functions as F

from arrow_supercluster_spark.operators.multimodal import (
    FEATURE_DIM,
    byte_histogram_features,
    documents_as_media,
    extract_features,
    frame_sample,
)


def _media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return documents_as_media(docs.limit(60))


def test_extract_features_matches_reference(spark, sf_dir):
    media = _media(spark, sf_dir)
    got = {r.media_id: r.feature for r in extract_features(media).collect()}
    for r in media.collect():
        want = byte_histogram_features(bytes(r.payload))
        assert len(got[r.media_id]) == FEATURE_DIM
        assert got[r.media_id] == [float(x) for x in want]


def test_frame_sample_matches_reference(spark, sf_dir):
    media = _media(spark, sf_dir)
    got = {
        (r.media_id, r.frame_idx): bytes(r.frame)
        for r in frame_sample(media, frame_bytes=64, stride=2).collect()
    }
    want = {}
    for r in media.filter(F.col("kind") == "video").collect():
        p = bytes(r.payload)
        for i in range(0, len(p) // 64, 2):
            want[(r.media_id, i)] = p[i * 64 : (i + 1) * 64]
    assert got == want and len(want) > 0


def test_frame_sample_filters_before_python(spark, sf_dir):
    """The kind filter must reach the scan, not run inside Python."""
    plan = frame_sample(_media(spark, sf_dir))._jdf.queryExecution().executedPlan().toString()
    fi = plan.index("Filter")
    mi = plan.index("MapInPandas")
    assert mi < fi, "filter must be below (after in print order) the Python map"


def test_wav_decode_roundtrip():
    """decode_wav inverts synthesize_wav exactly (bit-level PCM)."""
    from arrow_supercluster_spark.operators.multimodal import (
        decode_wav,
        synthesize_wav,
    )
    import numpy as np

    rate, s = decode_wav(synthesize_wav(7))
    assert rate == 8000 and len(s) == 4000
    assert abs(float(np.max(np.abs(s))) - (0.5 + (7 % 5) * 0.1)) < 1e-3


def test_wav_decode_rejects_garbage():
    from arrow_supercluster_spark.operators.multimodal import decode_wav
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"not a wav file at all")


def test_audio_features_match_synthesis(spark, sf_dir):
    """Decoded features match the synthesis closed form: dominant
    frequency (zero-crossing estimate) within 2% of the sine frequency,
    RMS = amplitude/sqrt(2) within 1%."""
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.operators.multimodal import (
        audio_features,
        documents_as_audio,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    out = audio_features(documents_as_audio(docs)).collect()
    assert len(out) == 40
    for r in out:
        freq = 200.0 + (r.media_id % 40) * 25.0
        amp = 0.5 + (r.media_id % 5) * 0.1
        assert r.sample_rate == 8000 and r.n_samples == 4000
        assert abs(r.zc_freq - freq) / freq < 0.02, r
        assert abs(r.rms - amp / 2**0.5) / (amp / 2**0.5) < 0.01, r
        assert len(r.frame_rms) == 4000 // 512


def test_bmp_decode_roundtrip():
    """decode_bmp inverts synthesize_bmp: dimensions and the id-tinted
    red channel come back exactly."""
    from arrow_supercluster_spark.operators.multimodal import (
        decode_bmp,
        synthesize_bmp,
    )

    img = decode_bmp(synthesize_bmp(5, width=32, height=24))
    assert img.shape == (24, 32, 3)
    assert int(img[:, :, 0].min()) == int(img[:, :, 0].max()) == (5 * 37) % 256
    # gradient: green grows with x, blue with y
    assert img[0, 0, 1] < img[0, -1, 1]
    assert img[0, 0, 2] < img[-1, 0, 2]


def test_bmp_resize_real(spark, sf_dir):
    """resize_images emits VALID BMPs at the target size; corner colors
    survive nearest-neighbor sampling."""
    from arrow_supercluster_spark.operators.multimodal import (
        decode_bmp,
        documents_as_images,
        resize_images,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    rows = resize_images(documents_as_images(docs), 16, 16).collect()
    assert len(rows) == 5
    for r in rows:
        img = decode_bmp(bytes(r.payload))
        assert img.shape == (16, 16, 3)
        assert int(img[0, 0, 0]) == (r.media_id * 37) % 256


def test_image_features_match_synthesis(spark, sf_dir):
    """Per-channel means match the synthesis closed form: red is the
    constant id tint; green/blue are gradient means ≈ 127.5."""
    from arrow_supercluster_spark.operators.multimodal import (
        documents_as_images,
        image_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    for r in image_features(documents_as_images(docs)).collect():
        assert (r.width, r.height) == (32, 24)
        assert abs(r.mean_r - (r.media_id * 37) % 256) < 1e-6
        assert abs(r.mean_g - 127.5) < 1.0 and abs(r.mean_b - 127.5) < 1.0


def test_audio_features_quarantines_bad_payloads(spark, sf_dir):
    """A malformed payload among good ones yields ok=false with null
    features — it must not kill the job (quarantine-and-count)."""
    import pandas as pd

    from arrow_supercluster_spark.operators.multimodal import (
        audio_features,
        synthesize_wav,
    )

    pdf = pd.DataFrame(
        {
            "media_id": [1, 2, 3],
            "payload": [synthesize_wav(1), b"garbage", b"RIFFxxxxWAVEfmt "],
            "n_bytes": [0, 0, 0],
        }
    )
    media = spark.createDataFrame(pdf)
    out = {r.media_id: r for r in audio_features(media).collect()}
    assert out[1].ok and out[1].sample_rate == 8000
    assert not out[2].ok and out[2].rms is None
    assert not out[3].ok


def test_pagerank_empty_edges(spark):
    from arrow_supercluster_spark.operators import graph

    edges = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(edges).count() == 0


# ---------------------------------------------------------------------------
# PNG codec (round 3 — stdlib-zlib de-stub of the compressed-image path)
# ---------------------------------------------------------------------------


def test_png_roundtrip_matches_bmp_pixels():
    """synthesize_png draws the same gradient as synthesize_bmp; decoding
    both must give identical pixel arrays — cross-validating the two
    independent codecs against each other."""
    import numpy as np

    from arrow_supercluster_spark.operators.multimodal import (
        decode_bmp,
        decode_png,
        synthesize_bmp,
        synthesize_png,
    )

    for mid in (0, 7, 123):
        png = decode_png(synthesize_png(mid))
        bmp = decode_bmp(synthesize_bmp(mid))
        assert png.shape == bmp.shape == (24, 32, 3)
        assert (png == bmp).all(), mid


def test_png_all_filter_types_decode():
    """Hand-build a PNG whose five scanlines use filter types 0-4 and
    check the decoder reverses each against a straight reference
    computation of the spec's recurrences."""
    import struct
    import zlib

    import numpy as np

    from arrow_supercluster_spark.operators.multimodal import decode_png

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8)

    def paeth(a, b, c):
        p = int(a) + int(b) - int(c)
        pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    stride = 7 * 3
    raw = b""
    prev = np.zeros(stride, dtype=np.int64)
    for row, ft in enumerate([0, 1, 2, 3, 4]):
        cur = img[row].reshape(-1).astype(np.int64)
        line = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                pred = paeth(a, b, c)
            line[i] = (cur[i] - pred) & 0xFF
        raw += bytes([ft]) + bytes(line.astype(np.uint8).tolist())
        prev = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    assert (got == img).all()


def test_png_features_spark(spark, sf_dir):
    from pyspark.sql import functions as F

    from arrow_supercluster_spark.operators.multimodal import (
        documents_as_pngs,
        png_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    feats = png_features(documents_as_pngs(docs))
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert (r.width, r.height) == (32, 24)
        # closed form of the gradient: mean_r = (id*37)%256 exactly
        assert abs(r.mean_r - (r.media_id * 37) % 256) < 1e-9


# ---------------------------------------------------------------------------
# AVI codec (round 3 — de-stubs video: real RIFF container, real frames)
# ---------------------------------------------------------------------------


def test_avi_roundtrip_closed_form():
    import numpy as np

    from arrow_supercluster_spark.operators.multimodal import (
        decode_avi,
        synthesize_avi,
    )

    for mid in (0, 3, 99):
        fps, frames = decode_avi(synthesize_avi(mid, n_frames=6, fps=12))
        assert fps == 12 and len(frames) == 6
        for i, f in enumerate(frames):
            assert f.shape == (24, 32, 3)
            # closed form: constant red channel stepping by 11 per frame
            assert float(f[:, :, 0].mean()) == (mid * 37 + i * 11) % 256
            assert f[:, :, 0].min() == f[:, :, 0].max()


def test_avi_frame_matches_bmp_gradient():
    """Frame 0's green/blue gradient equals the BMP/PNG gradient — the
    three image-bearing codecs share one raster definition."""
    from arrow_supercluster_spark.operators.multimodal import (
        decode_avi,
        decode_bmp,
        synthesize_avi,
        synthesize_bmp,
    )

    _, frames = decode_avi(synthesize_avi(7))
    bmp = decode_bmp(synthesize_bmp(7))
    assert (frames[0][:, :, 1:] == bmp[:, :, 1:]).all()


def test_video_frame_features_spark(spark, sf_dir):
    from arrow_supercluster_spark.operators.multimodal import (
        documents_as_videos,
        video_frame_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    rows = video_frame_features(documents_as_videos(docs), stride=2).collect()
    # 8 frames, stride 2 → 4 rows per doc
    assert len(rows) == 40
    for r in rows:
        assert r.frame_idx % 2 == 0 and r.fps == 10
        assert abs(r.mean_r - (r.media_id * 37 + r.frame_idx * 11) % 256) < 1e-9


def test_png_malformed_payloads_raise_value_error():
    """Corrupt streams must fail with ValueError, never NameError /
    silent truncation (ADVICE r3): IDAT before IHDR, missing IHDR, and a
    chunk length pointing past the payload end."""
    import struct
    import zlib

    import pytest

    from arrow_supercluster_spark.operators.multimodal import decode_png

    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    with pytest.raises(ValueError, match="IDAT before IHDR"):
        decode_png(sig + chunk(b"IDAT", zlib.compress(b"\x00\x01")))
    with pytest.raises(ValueError, match="missing IHDR"):
        decode_png(sig + chunk(b"IEND", b""))
    oversize = sig + struct.pack(">I", 10_000) + b"IHDR" + b"\x00" * 13
    with pytest.raises(ValueError, match="exceeds payload"):
        decode_png(oversize)
    bad_ihdr = sig + chunk(b"IHDR", b"\x00" * 5)
    with pytest.raises(ValueError, match="IHDR length"):
        decode_png(bad_ihdr)


# ---------------------------------------------------------------------------
# JPEG codec (round 4 — from-scratch baseline Huffman+IDCT de-stub)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_within_quantization_error():
    """Encode the BMP/PNG gradient as a real JFIF and decode it back:
    JPEG is lossy, so parity with the lossless codecs is bounded, not
    exact — the Annex-K tables at this image size keep the error under
    a few intensity units. Also: the payload must be a structurally
    valid JFIF (SOI/APP0/EOI)."""
    import numpy as np

    from arrow_supercluster_spark.operators.multimodal import (
        decode_bmp,
        decode_jpeg,
        synthesize_bmp,
        synthesize_jpeg,
    )

    for mid in (0, 7, 123):
        payload = synthesize_jpeg(mid)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        assert payload[6:10] == b"JFIF"
        img = decode_jpeg(payload)
        ref = decode_bmp(synthesize_bmp(mid))
        assert img.shape == ref.shape == (24, 32, 3)
        d = np.abs(img.astype(int) - ref.astype(int))
        assert d.mean() < 4 and d.max() <= 25, (mid, d.mean(), d.max())


def test_jpeg_idct_matches_spec_direct_form():
    """The decoder's matrix IDCT must equal the spec's (A.3.3) direct
    double-sum with C(u)C(v)/4 scaling on random coefficient blocks."""
    import numpy as np

    from arrow_supercluster_spark.operators.multimodal import _jpeg_dct_matrix

    rng = np.random.RandomState(11)
    C = _jpeg_dct_matrix()
    for _ in range(5):
        D = rng.randint(-500, 500, size=(8, 8)).astype(np.float64)
        fast = C.T @ D @ C
        direct = np.zeros((8, 8))
        for xpix in range(8):
            for ypix in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = (1 / np.sqrt(2)) if u == 0 else 1.0
                        cv = (1 / np.sqrt(2)) if v == 0 else 1.0
                        s += (
                            cu * cv * D[u, v]
                            * np.cos((2 * xpix + 1) * u * np.pi / 16)
                            * np.cos((2 * ypix + 1) * v * np.pi / 16)
                        )
                direct[xpix, ypix] = s / 4.0
        assert np.allclose(fast, direct.T if False else direct, atol=1e-9)


def test_jpeg_encode_arbitrary_sizes_and_content():
    """Non-multiple-of-8 sizes (edge padding) and random content must
    survive the encode→decode loop with bounded error."""
    import numpy as np

    from arrow_supercluster_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(5)
    for h, w in ((8, 8), (17, 23), (24, 32)):
        # smooth content (JPEG's contract is bounded error on smooth data)
        gx = np.linspace(0, 255, w)[None, :]
        gy = np.linspace(0, 255, h)[:, None]
        img = np.stack(
            [gx + 0 * gy, 0 * gx + gy, (gx + gy) / 2], axis=-1
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img))
        assert out.shape == (h, w, 3)
        d = np.abs(out.astype(int) - img.astype(int))
        assert d.mean() < 6, (h, w, d.mean())


def test_jpeg_malformed_payloads_raise_value_error():
    import struct

    import pytest

    from arrow_supercluster_spark.operators.multimodal import (
        decode_jpeg,
        synthesize_jpeg,
    )

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01")
    good = synthesize_jpeg(1)
    # flip SOF0 → SOF2 (progressive) — must refuse, not garble
    i = good.find(b"\xff\xc0")
    prog = good[:i] + b"\xff\xc2" + good[i + 2:]
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)
    # truncate the entropy stream
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])


def test_jpeg_features_spark(spark, sf_dir):
    from arrow_supercluster_spark.operators.multimodal import (
        documents_as_jpegs,
        jpeg_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(12)
    rows = jpeg_features(documents_as_jpegs(docs)).collect()
    assert len(rows) == 12
    for r in rows:
        assert (r.width, r.height) == (32, 24)
        # red channel ≈ the id-tinted constant (lossy: small tolerance)
        assert abs(r.mean_r - (r.media_id * 37) % 256) < 6
