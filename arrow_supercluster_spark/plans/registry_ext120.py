"""Round-5 registry additions, batch 115 — the GIF/LZW codec:

- q_gif_features: REAL GIF87a decode over real GIF payloads — the
  sixth from-scratch codec (after BMP, PNG, JPEG, WAV, AVI) and the
  first with a dictionary compressor: genuine LZW with variable-width
  codes (9→12 bits), clear-code dictionary resets, LSB-first bit
  packing, and 255-byte sub-block framing, per the public GIF87a spec
  (CompuServe 1987) and Welch 1984. The grayscale source image has
  ≤256 distinct values by construction, so the palette represents it
  exactly and the roundtrip test demands BIT-IDENTITY between the
  decoded pixels and the closed-form source formula (an oracle
  independent of every codec internal). Rows-only (binary decode).
"""

from __future__ import annotations

from arrow_supercluster_spark.operators import multimodal as mm
from arrow_supercluster_spark.plans.registry_core import register


@register("q_gif_features", None)
def q_gif_features(spark, sf_dir):
    """R341 — GIF87a/LZW decode pipeline: synthesize real GIF files per
    doc (mapInPandas, executor-side), decode them where the bytes sit
    (header walk → palette → sub-block reassembly → LZW decompress →
    palette map), emit scalar luma features + the achieved LZW
    compression ratio. Payloads never shuffle; output is a few scalars
    per file — the 100 TB media posture. Bit-exact roundtrip vs the
    closed-form pixel formula (including the forced 12-bit/dictionary
    -reset case) and malformed-payload quarantine are pinned in
    tests/test_batch115.py."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mm.gif_features(mm.documents_as_gifs(docs))
