"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

Beyond-reference extension (BASELINE.json). The decode step is STUBBED
(image/audio libraries are not in this container): ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder derives metadata from the byte content.
Everything Spark-side is real and tested: binary schema, Arrow-batched
mapInPandas plumbing, partitioning, batch shapes.

Scale design: mapInPandas streams Arrow record batches — constant
memory per task regardless of partition size; binary payloads never
pass through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoders, if ever present
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover - container has no PIL
    _HAS_PIL = False


IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column + media metadata
    struct (here derived from the text column; in production this is
    the raw image/audio bytes read from object storage)."""

    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias(
                "n_bytes"
            ),
            F.lit("fake/png").alias("format"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decoder: metadata derived from byte length.

    Mirrors the oracle expression: width = n % 640 + 1,
    height = n % 480 + 1.
    """

    n = len(payload)
    return "fake/png", n % 640 + 1, n % 480 + 1


def decode_image(binaries: DataFrame, fake: bool = True) -> DataFrame:
    """Decode image binaries to metadata via Arrow-batched mapInPandas.

    With ``fake=False`` this requires a real image library (PIL) —
    not available in this container -> NotImplementedError. The fake
    path exercises the identical Spark plumbing (schema, batching,
    binary transfer) with a deterministic decoder.
    """

    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL; not available in this "
            "container — use fake=True to exercise the pipeline"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "format": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                }
            )

    return binaries.select("doc_id", "payload").mapInPandas(
        decode, schema=IMAGE_META_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_image(
    binaries: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """Resize stub via Arrow-batched mapInPandas: binary in, binary
    out. The fake path emits a deterministic fixed-size payload
    (truncate/cycle the source bytes to width*height) so the
    binary-throughput plumbing — the real part — is exercised; a real
    build swaps `_fake_resize` for PIL's resize."""

    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "real image resize requires PIL; not available in this "
            "container — use fake=True to exercise the pipeline"
        )

    target = width * height

    def _fake_resize(p: bytes) -> bytes:
        if not p:
            return bytes(target)
        reps = target // len(p) + 1
        return (p * reps)[:target]

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [_fake_resize(p) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return binaries.select("doc_id", "payload").mapInPandas(
        go, schema=RESIZED_SCHEMA
    )


def extract_features(
    binaries: DataFrame, dim: int = 16, fake: bool = True
) -> DataFrame:
    """Feature extraction stub: payload -> float vector of ``dim``
    (the column shape the similarity operators consume). The fake
    featurizer is a byte-value histogram folded to ``dim`` buckets and
    L1-normalized — deterministic, vectorized with numpy over Arrow
    batches; a real build swaps in a vision/audio model here."""

    if not fake:
        raise NotImplementedError(
            "real feature extraction requires a model runtime; use "
            "fake=True to exercise the pipeline"
        )

    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(p or b"\x00", dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum()
                feats.append(hist / total if total else hist)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return binaries.select("doc_id", "payload").mapInPandas(go, schema=schema)


def frame_sample(
    binaries: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """'Video' frame sampling stub: emit one row per sampled offset —
    the real implementation would decode container frames; the Spark
    shape (explode to frame rows, bounded fanout) is the real part."""

    return (
        binaries.select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"slice(sequence(0, CAST(length(payload) AS INT), {every_n_bytes}), 1, {max_frames})"
                )
            ).alias("frame_idx", "byte_offset"),
        )
    )


def chunk_audio(
    binaries: DataFrame,
    sample_rate: int = 16000,
    bytes_per_sample: int = 2,
    window_s: float = 0.5,
    hop_s: float = 0.25,
    max_chunks: int = 16,
) -> DataFrame:
    """'Audio' segmentation stub: emit one row per overlapping window
    over the raw byte stream — (doc_id, chunk_idx, start_byte,
    end_byte, start_s). The real implementation would decode the
    container to PCM first (no audio libs in this container); the
    Spark shape — bounded overlapping-window fanout as a row-local
    sequence explode, no shuffle — is the real part, mirroring how a
    production pipeline windows waveforms for feature extraction.
    """

    frame_bytes = int(sample_rate * bytes_per_sample * window_s)
    hop_bytes = int(sample_rate * bytes_per_sample * hop_s)
    starts = F.expr(
        f"slice(sequence(0, greatest(CAST(length(payload) AS INT) - 1, 0), "
        f"{hop_bytes}), 1, {max_chunks})"
    )
    return binaries.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_idx", "start_byte"),
        F.col("payload"),
    ).select(
        "doc_id",
        "chunk_idx",
        "start_byte",
        F.least(
            F.col("start_byte") + F.lit(frame_bytes),
            F.length("payload").cast("int"),
        ).alias("end_byte"),
        F.round(
            F.col("start_byte") / F.lit(float(sample_rate * bytes_per_sample)),
            4,
        ).alias("start_s"),
    )
