"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct.
The Spark-side machinery — schema, partition-friendly batch shape,
``mapInPandas`` Arrow UDFs — is real and tested.  Codecs: PNG/BMP/WAV are
REAL (pure stdlib zlib/wave + numpy — see ``operators/codecs.py``; decode,
metadata, nearest-neighbor resize, PNG re-encode all operate on actual
bytes), and mp4 METADATA is real too (pure ISO-BMFF box parse:
moov/mvhd/tkhd → duration/dims).  Only video FRAME decode stays stubbed
(``sample_frames`` slices bytes; a real impl needs ffmpeg, absent here).
``fake=True`` swaps in a deterministic md5 metadata extractor for
synthetic-payload pipelines whose bytes aren't actual media.

Batch shape: ``mapInPandas`` receives Arrow batches (pandas DataFrames);
binary payloads stay as Python ``bytes`` inside the batch — zero-copy from
Arrow.  Partitioning: media rows are heavy, so upstream should
``repartitionByRange`` on size or use ``maxRecordsPerBatch`` to bound batch
memory; the functions here are shape-preserving (1 row in → 1 row out) or
exploding (frame sampling) and never collect.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("byte_len", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("format", StringType(), True),
    ]
)


def _fake_meta(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real codec: derives plausible metadata
    from an md5 of the payload.  Replace with PIL/ffmpeg on a real cluster."""
    h = hashlib.md5(payload).digest()
    width = 64 + (h[0] % 64) * 16
    height = 64 + (h[1] % 64) * 16
    return {
        "byte_len": len(payload),
        "width": width if kind == "image" else None,
        "height": height if kind == "image" else None,
        "duration_ms": (1000 + int.from_bytes(h[2:4], "big")) if kind in ("audio", "video") else None,
        "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
    }


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Extract metadata from the binary payload via mapInPandas.

    ``fake=False`` decodes REAL payloads (PNG/BMP/WAV/mp4-metadata —
    codecs.media_meta).  ``fake=True`` uses the deterministic md5 stand-in
    (synthetic-payload pipelines where the bytes aren't actual media).
    Input needs columns (media_id, kind, payload)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import media_meta

        for pdf in batches:
            metas = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if payload is None:
                    metas.append({"byte_len": None, "width": None, "height": None,
                                  "duration_ms": None, "format": None})
                    continue
                if fake:
                    metas.append(_fake_meta(bytes(payload), kind))
                else:
                    metas.append(media_meta(bytes(payload)))
            meta_df = pd.DataFrame(metas)
            out = pdf[["media_id", "kind", "payload"]].reset_index(drop=True)
            yield pd.concat([out, meta_df], axis=1)

    return df.mapInPandas(extract, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), True),  # re-encoded PNG
    ]
)


def resize_images(df: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Real image transform: decode (PNG/BMP) → nearest-neighbor resize →
    PNG re-encode, batch-wise in mapInPandas.  Shape-preserving (1→1);
    undecodable payloads are dropped (logged rows would poison retries)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import CodecError, decode_image, encode_png, resize_nearest

        for pdf in batches:
            ids, payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    img = decode_image(bytes(payload))
                except (CodecError, NotImplementedError):
                    continue
                ids.append(mid)
                payloads.append(encode_png(resize_nearest(img, out_w, out_h)))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [out_w] * len(ids),
                    "height": [out_h] * len(ids),
                    "payload": payloads,
                }
            )

    return df.mapInPandas(work, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Frame sampling stub: deterministically slices the payload into
    ``max_frames`` pseudo-frames (real impl: ffmpeg keyframe extraction).
    Demonstrates the exploding (1→N) mapInPandas shape."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                n = min(max_frames, max(1, len(raw) // max(every_n, 1)))
                step = max(1, len(raw) // n)
                for j in range(n):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(raw[j * step : (j + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)
