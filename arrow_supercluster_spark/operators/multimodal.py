"""Multimodal column plumbing (SURVEY.md §2b mandate): image/audio/video as
opaque binary columns with typed metadata, processed by Arrow-batched
Pandas kernels via mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which
case a deterministic fake decoder (byte-histogram features) exercises the
REAL Spark plumbing — schema, batching, partition sizing — end-to-end.

Scale design: mapInPandas streams Arrow batches through Python once (no
shuffle); batch size is bounded by spark.sql.execution.arrow.
maxRecordsPerBatch so a partition of large blobs never materializes at
once. Binary payloads should live in their own column so column pruning
skips them when queries touch only metadata.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, n_bytes long"
)
FEATURE_DIM = 16


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from `documents` (the container
    ships no real image/audio data): payload = utf-8 bytes of the text,
    kind cycles image/audio/video. Exercises binary columns + metadata."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/libav — not in this container. The
    deterministic fake maps bytes → a 16-bin byte histogram (float32),
    standing in for decoded pixel features."""
    if not fake:
        raise NotImplementedError(
            "image/audio decode requires media libraries not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    return (hist / max(len(arr), 1)).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, n_bytes,
    feature array<float>). Arrow-batched; payload column pruned away
    immediately after use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(p, fake=fake).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(
        run,
        schema="media_id long, kind string, n_bytes long, feature array<float>",
    )


def resize_stub(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: passes payloads through the same mapInPandas shape;
    the real pixel op is NotImplemented (no decoder), so this truncates/pads
    payload bytes to width·height as a deterministic stand-in, keeping the
    batch-shape and schema contract real and testable."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (p[:target]).ljust(target, b"\0") for p in pdf["payload"]
            ]
            pdf = pdf.copy()
            pdf["payload"] = out
            pdf["n_bytes"] = [len(p) for p in out]
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def frame_sample(
    media: DataFrame,
    frame_bytes: int = 256,
    stride: int = 4,
    kind: str = "video",
) -> DataFrame:
    """Frame sampling plumbing (one row → many): treat a video payload as
    a sequence of fixed-size frames and emit every `stride`-th frame as
    its own row — the mapInPandas shape of real frame extraction (libav
    would replace the byte-slicing; the container has no decoder, so
    frames are deterministic payload slices, keeping schema/batching
    real). Non-`kind` rows are filtered BEFORE Python, and the filter +
    payload pruning push to the scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n = len(p) // frame_bytes
                for i in range(0, n, stride):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(p[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.filter(F.col("kind") == kind).mapInPandas(
        run, schema="media_id long, frame_idx int, frame binary"
    )
