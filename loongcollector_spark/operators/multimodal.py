"""Multimodal column plumbing (image/audio/video as opaque binary).

Training-data-pipeline addition: media travels as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. The decode
kernels themselves are STUBBED (the image/audio libraries are not in
this container): ``deterministic_fake=True`` produces seeded fake
features so the Spark-side plumbing — schema, batch shape,
partitioning — is real and testable; ``deterministic_fake=False``
raises NotImplementedError where a real codec call would go.

Batch-shape contract: every stage is ``iterator[pd.DataFrame] →
iterator[pd.DataFrame]`` so Spark streams Arrow batches without
materializing a partition in memory — required at 100 TB where a
partition of videos exceeds RAM.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "extract_features",
    "sample_frames",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, binary_col: str = "media", meta_col: str = "media_meta"
) -> DataFrame:
    """Derive cheap metadata without decoding: size + magic-byte format
    sniffing — pure JVM expressions over the binary column."""
    b = F.col(binary_col)
    head = F.hex(F.substring(b, 1, 4))
    fmt = (
        F.when(head.startswith("89504E47"), "png")
        .when(head.startswith("FFD8"), "jpg")
        .when(head.startswith("52494646"), "wav")
        .when(head.startswith("00000018") | head.startswith("00000020"), "mp4")
        .otherwise("unknown")
    )
    media_type = (
        F.when(fmt.isin("png", "jpg"), "image")
        .when(fmt == "wav", "audio")
        .when(fmt == "mp4", "video")
        .otherwise("unknown")
    )
    return df.withColumn(
        meta_col,
        F.struct(
            media_type.alias("media_type"),
            fmt.alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(b).cast("long").alias("size_bytes"),
        ),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake embedding: sha256-seeded values in [-1, 1).
    Stands in for a real encoder; same bytes → same vector."""
    out = []
    h = payload or b""
    i = 0
    while len(out) < dim:
        d = hashlib.sha256(h + i.to_bytes(4, "big")).digest()
        for j in range(0, 32, 4):
            if len(out) >= dim:
                break
            v = int.from_bytes(d[j : j + 4], "big")
            out.append((v / 2**31) - 1.0)
        i += 1
    return out


def extract_features(
    df: DataFrame,
    binary_col: str = "media",
    dest: str = "features",
    dim: int = 16,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Feature extraction over Arrow batches (mapInPandas).

    Real deployment: replace ``_fake_feature`` with the model/codec
    call — the schema, batching, and partition contract are unchanged.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(dest, T.ArrayType(T.DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; use deterministic_fake=True"
                )
            pdf[dest] = pdf[binary_col].map(
                lambda b: _fake_feature(bytes(b) if b is not None else b"", dim)
            )
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "media",
    dest: str = "frames",
    n_frames: int = 4,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Frame sampling for video columns: emits an array of per-frame
    binary payloads (fake: deterministic byte slices). Shows the
    explode-ready array-of-binary contract."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(dest, T.ArrayType(T.BinaryType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("real frame decode not available here")

            def fake_frames(b):
                raw = bytes(b) if b is not None else b""
                step = max(len(raw) // n_frames, 1)
                return [
                    hashlib.sha256(raw[i * step : (i + 1) * step]).digest()
                    for i in range(n_frames)
                ]

            pdf[dest] = pdf[binary_col].map(fake_frames)
            yield pdf

    return df.mapInPandas(run, out_schema)
