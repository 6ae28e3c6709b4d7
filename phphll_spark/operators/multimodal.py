"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing — schemas, mapInPandas batch shapes, partitioning,
UDF signatures — is real and tested. The actual media decoding is STUBBED
(the image/audio libraries are not in this container): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the byte content) produces stable
features so the distributed plumbing is verifiable end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical media table schema: (media_id, kind, content binary, meta struct)
MEDIA_TABLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("content", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("mime", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), False),
    ]
)


def _fake_decode(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived from a
    seeded hash of the bytes. Stable across runs/partitionings."""
    seed = int.from_bytes(content[:8].ljust(8, b"\0"), "little") ^ len(content)
    rng = np.random.default_rng(seed & 0x7FFFFFFF)
    return rng.standard_normal(dim)


def decode_image(content: bytes) -> np.ndarray:
    """Real image decode — requires PIL/opencv, not present in this
    container. Cite: this engine treats media as opaque binary exactly so
    this stays swappable."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use extract_features(..., fake=True) for plumbing tests"
    )


def extract_features(df: DataFrame, *, dim: int = 16, fake: bool = False) -> DataFrame:
    """Batch feature extraction over a media table (mapInPandas, narrow).

    Real pipeline: decode → resize/frame-sample → embed, per Arrow batch.
    Here the decode step is stubbed (``fake=True`` → deterministic fake);
    everything around it (batching, schema, null payloads) is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, n_bytes = [], []
            for content in pdf["content"]:
                raw = b"" if content is None else bytes(content)
                n_bytes.append(len(raw))
                if fake:
                    feats.append(_fake_decode(raw, dim))
                else:
                    feats.append(decode_image(raw))  # pragma: no cover
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("content", BinaryType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def resize_images(df: DataFrame, *, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize step of the media pipeline (mapInPandas, narrow). Real
    implementation needs an imaging library; ``fake=True`` produces a
    deterministic fixed-size surrogate (content-seeded bytes of
    width*height) so batch shape/schema/partitioning are testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for content in pdf["content"]:
                raw = b"" if content is None else bytes(content)
                if not fake:
                    decode_image(raw)  # pragma: no cover — raises
                seed = int.from_bytes(raw[:8].ljust(8, b"\0"), "little") ^ (width * 31 + height)
                rng = np.random.default_rng(seed & 0x7FFFFFFF)
                out.append(rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "content": out,
                }
            )

    return df.select("media_id", "content").mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, *, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (media_id, frame_idx, ts_ms, frame) — a 1->N mapInPandas expansion.
    Frame count derives from meta.duration_ms; decode is stubbed like the
    rest of the media path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, tss, frames = [], [], [], []
            for mid, content, dur in zip(pdf["media_id"], pdf["content"], pdf["duration_ms"]):
                raw = b"" if content is None else bytes(content)
                if not fake:
                    decode_image(raw)  # pragma: no cover — raises
                n_frames = max(1, int(dur or 0) // every_ms)
                for fi in range(n_frames):
                    seed = (int(mid) << 16) ^ fi
                    rng = np.random.default_rng(seed & 0x7FFFFFFF)
                    ids.append(mid)
                    idxs.append(fi)
                    tss.append(fi * every_ms)
                    frames.append(rng.integers(0, 256, size=64, dtype=np.uint8).tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    src = df.filter(df["kind"] == "video").select(
        "media_id", "content", df["meta"]["duration_ms"].alias("duration_ms")
    )
    return src.mapInPandas(run, schema=FRAME_SCHEMA)


def make_fake_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        content = bytes(rng.integers(0, 256, size=32 + i % 64, dtype=np.uint8))
        kind = kinds[i % 3]
        meta = (64 + i % 512, 48 + i % 256, None, f"{kind}/fake") if kind == "image" else (None, None, 1000 + i, f"{kind}/fake")
        rows.append((i, kind, content, meta))
    return spark.createDataFrame(rows, MEDIA_TABLE_SCHEMA)
