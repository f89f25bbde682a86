"""Multimodal (image/audio/video) column plumbing.

≈ Clara's raster ingestion: ``loadpgm`` header parse + chunked pixel
load (pgmblock.c:263-457) and PBM bit-unpacking (pbm2cl.c:824+) — the
reference IS an image pipeline, so the corpus-scale analogue keeps
media as opaque ``binary`` columns with typed metadata and runs
decode/feature/resize/frame-sample as Arrow-batched stages.

This container has no image/audio codecs, so REAL codec decode is
stubbed behind an import-try (``NotImplementedError`` with the exact
dependency named); everything Spark-side — schema, batch iteration,
partition behavior, numpy vectorization over payload bytes — is real
and tested.  A deterministic fake "codec" (self-describing header)
stands in for the decoder so shape logic is exercised end-to-end.

Fake codec layout (big-endian):  magic ``CLMM`` | kind:1 (0=img,
1=audio, 2=video) | width:4 | height:4 | frames:4 | payload bytes.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_MAGIC = b"CLMM"
_KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("frames", IntegerType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
    ]
)


def encode_fake(media_id: int, kind: int, w: int, h: int, frames: int) -> bytes:
    """Deterministic fake media blob (payload = seeded byte ramp)."""
    n = min(w * h, 4096)
    payload = bytes((media_id * 31 + i * 7) % 256 for i in range(n))
    return struct.pack(">4sBIII", _MAGIC, kind, w, h, frames) + payload


def make_media(spark, n: int = 64) -> DataFrame:
    rows = []
    for i in range(n):
        kind = i % 3
        w, h = 32 + (i % 5) * 16, 32 + (i % 7) * 8
        frames = 1 if kind == 0 else 16 + i % 8
        rows.append((i, _KINDS[kind], encode_fake(i, kind, w, h, frames)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _real_decode(payload: bytes):  # pragma: no cover - no codecs in image
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs Pillow; this container ships no "
            "codecs — the fake-codec path exercises the same plumbing"
        ) from e


def _decode_one(payload: bytes) -> tuple[int, int, int, bytes]:
    if payload[:4] != _MAGIC:
        _real_decode(payload)
    _, kind, w, h, frames = struct.unpack(">4sBIII", payload[:17])
    return w, h, frames, payload[17:]


def _feature_hist(body: bytes, bins: int = 8) -> list[float]:
    """Byte-histogram features — numpy over the whole batch-row body
    (the stand-in for pixel-space features; ≈ graydist histogram,
    pgmblock.c:426-432)."""
    arr = np.frombuffer(body, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * bins
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    return (hist / arr.size).astype(np.float32).tolist()


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, kind, payload in zip(
            pdf["media_id"], pdf["kind"], pdf["payload"]
        ):
            w, h, frames, body = _decode_one(bytes(payload))
            out.append(
                (int(mid), kind, w, h, frames, len(body), _feature_hist(body))
            )
        yield pd.DataFrame(
            out, columns=[f.name for f in DECODED_SCHEMA.fields]
        )


def decode(media: DataFrame) -> DataFrame:
    """media → decoded metadata + feature vectors (mapInPandas)."""
    return media.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every: int = 4) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame index —
    pure JVM explode of a sequence, no Python."""
    vids = decoded.filter(F.col("kind") == "video")
    idx = F.sequence(
        F.lit(0), F.col("frames") - 1, F.lit(every)
    )
    return vids.select(
        "media_id", F.explode(idx).alias("frame_idx"), "width", "height"
    )


def resize_plan(decoded: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize planning (aspect-preserving target dims) as column
    arithmetic; actual pixel resample would live in the decode UDF."""
    scale = F.least(
        F.lit(max_dim) / F.col("width"), F.lit(max_dim) / F.col("height"), F.lit(1.0)
    )
    return decoded.select(
        "media_id",
        "kind",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("target_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("target_h"),
    )
