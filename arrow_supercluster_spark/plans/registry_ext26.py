"""Round-2 registry additions, batch 21 — multimodal dedup/analysis depth
(all rows-only: binary decode paths are not SQL-expressible; each carries
closed-form parity tests in tests/test_batch21.py):

- q_image_phash: perceptual average-hash (aHash) over REAL BMP payloads;
- q_image_neardup: Hamming near-duplicate image pairs via 16-bit band
  equi-joins (pigeonhole-exact recall for dist ≤ 3) + bit_count verify;
- q_audio_spectral: numpy rFFT dominant frequency + spectral centroid
  over REAL WAV payloads (the spectral upgrade of q_audio_features'
  zero-crossing estimate).
"""

from __future__ import annotations

from arrow_supercluster_spark.operators import multimodal as mm
from arrow_supercluster_spark.plans.registry_core import register


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@register("q_image_phash", None)
def q_image_phash(spark, sf_dir):
    """Multimodal — perceptual image hash (aHash, public algorithm):
    decode 24-bit BMP → luma → 8×8 nearest downsample → mean threshold →
    64-bit hash, over the textured corpus (the plain gradient corpus
    differs only by uniform tint, which mean-thresholding cancels).
    Arrow-batched mapInPandas, payload never shuffled
    (hash computed where the bytes sit). Rows-only (binary decode);
    parity: identical synthesized images hash identically, a one-pixel
    perturbation moves ≤ a few bits (tests/test_batch21.py)."""
    return mm.image_ahash(mm.documents_as_textured_images(_docs(spark, sf_dir)))


@register("q_image_neardup", None)
def q_image_neardup(spark, sf_dir):
    """Multimodal — near-duplicate IMAGE pairs: aHash banding (4×16-bit
    band equi-joins — never all-pairs; recall is pigeonhole-exact for
    Hamming ≤ 3) + bit_count(xor) verification. The SimHash text-dedup
    plan with an image decode stage upstream; only (id, hash, band)
    tuples shuffle. Rows-only; recall-vs-brute-force asserted exact in
    tests/test_batch21.py."""
    hashes = mm.image_ahash(mm.documents_as_textured_images(_docs(spark, sf_dir)))
    return mm.ahash_neardup_pairs(hashes, max_dist=3, bands=4)


@register("q_audio_spectral", None)
def q_audio_spectral(spark, sf_dir):
    """Multimodal — spectral audio features via numpy rFFT: dominant
    frequency (true spectral peak) and spectral centroid per WAV
    payload, quarantine-and-count posture for undecodable bytes.
    Rows-only; synthesis parity (detected peak == synthesized sine
    frequency to within one FFT bin) in tests/test_batch21.py."""
    return mm.audio_spectral(mm.documents_as_audio(_docs(spark, sf_dir)))
