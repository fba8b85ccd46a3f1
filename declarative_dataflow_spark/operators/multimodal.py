"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

Beyond-reference extension (BASELINE.json). Decode/resize/features are
REAL for natively-decodable formats — PPM (P6) and uncompressed 24-bit
BMP parse with pure numpy (header + reshape), resize is a
nearest-neighbor resample, features are a grayscale block-mean grid —
no image library needed. Compressed formats (PNG/JPEG) fall back to
PIL when present (not in this container) and report 'undecodable'
otherwise; ``fake=True`` swaps in deterministic byte-derived stand-ins
to exercise the identical Spark plumbing on arbitrary payloads.
Everything Spark-side is real and tested either way: binary schema,
Arrow-batched mapInPandas plumbing, partitioning, batch shapes.

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


# -- real decoders (pure numpy, no image library required) -------------
#
# PPM (P6) and uncompressed 24-bit BMP decode with nothing but header
# parsing + a numpy reshape, so the "real" path is genuinely functional
# in this container for those formats; compressed formats (PNG/JPEG)
# still require PIL and raise without it.


def _decode_ppm(payload: bytes):
    """P6 PPM -> (width, height, HxWx3 uint8 array). Raises ValueError
    on malformed input."""

    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # Header tokens: P6, width, height, maxval — comments (#...) allowed.
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raw RGB
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return w, h, pixels.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BI_RGB, bottom-up) -> (width, height,
    HxWx3 uint8 RGB array)."""

    import struct

    import numpy as np

    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if flip:
        img = img[::-1]
    return w, h, img.copy()


def _decode_real(payload: bytes):
    """(format, width, height, array) for natively-decodable payloads;
    falls back to PIL when present; raises ValueError otherwise."""

    if payload.startswith(b"P6"):
        w, h, arr = _decode_ppm(payload)
        return "ppm", w, h, arr
    if payload.startswith(b"BM"):
        w, h, arr = _decode_bmp(payload)
        return "bmp", w, h, arr
    if _HAS_PIL:  # pragma: no cover - container has no PIL
        import io

        import numpy as np

        im = Image.open(io.BytesIO(payload)).convert("RGB")
        return (
            (im.format or "pil").lower(),
            im.width,
            im.height,
            np.asarray(im),
        )
    raise ValueError("undecodable payload (PPM/BMP native; PNG/JPEG need PIL)")


def encode_ppm(arr) -> bytes:
    """HxWx3 uint8 array -> P6 PPM bytes (the canonical re-encode
    format for the native path)."""

    h, w = arr.shape[0], arr.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype("uint8").tobytes()


def decode_image(binaries: DataFrame, fake: bool = True) -> DataFrame:
    """Decode image binaries to metadata via Arrow-batched mapInPandas.

    With ``fake=False``, PPM (P6) and uncompressed 24-bit BMP decode
    NATIVELY (pure numpy header parse + reshape — no image library);
    other formats fall back to PIL when present, else the row comes
    back with format='undecodable' and NULL dimensions. The fake path
    exercises the identical Spark plumbing (schema, batching, binary
    transfer) with a deterministic decoder.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for p in pdf["payload"]:
                if fake:
                    metas.append(_fake_decode(p))
                else:
                    try:
                        fmt, w, h, _ = _decode_real(p)
                        metas.append((fmt, w, h))
                    except Exception:  # malformed headers raise
                        # struct.error/IndexError too, not only
                        # ValueError — any failure flags the row
                        metas.append(("undecodable", None, None))
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
    """Resize via Arrow-batched mapInPandas: binary in, binary out.

    ``fake=False`` REALLY resizes natively-decodable payloads
    (PPM/BMP): nearest-neighbor resample with numpy index arithmetic,
    re-encoded as P6 PPM. An undecodable payload degrades that ROW to
    a null output payload (consistent with decode_image's
    'undecodable' rows) — one bad byte string must never fail the
    whole stage. The fake path emits a deterministic fixed-size
    payload (truncate/cycle the source bytes) so the binary-throughput
    plumbing is exercised without decodable data."""

    target = width * height

    def _fake_resize(p: bytes) -> bytes:
        if not p:
            return bytes(target)
        reps = target // len(p) + 1
        return (p * reps)[:target]

    def _real_resize(p: bytes):
        import numpy as np

        try:
            _, w, h, arr = _decode_real(p)
        except Exception:  # incl. struct.error from truncated headers
            return None  # undecodable row: null payload, stage survives
        yi = (np.arange(height) * h // height).astype("int64")
        xi = (np.arange(width) * w // width).astype("int64")
        return encode_ppm(arr[yi][:, xi])

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _fake_resize(p) if fake else _real_resize(p)
                        for p in pdf["payload"]
                    ],
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
    """Feature extraction: payload -> float vector of ``dim`` (the
    column shape the similarity operators consume).

    ``fake=False`` computes REAL pixel features for natively-decodable
    payloads (PPM/BMP): a sqrt(dim) x sqrt(dim) grayscale grid of
    block means, L1-normalized — a classic retrieval baseline,
    deterministic and model-free; an undecodable payload degrades that
    ROW to null features rather than failing the stage. The fake
    featurizer is a byte-value
    histogram (exercises plumbing on undecodable data); a model
    runtime can replace either."""

    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def _byte_hist(p: bytes):
        arr = np.frombuffer(p or b"\x00", dtype=np.uint8)
        hist = np.bincount(arr % dim, minlength=dim).astype("float32")
        total = hist.sum()
        return hist / total if total else hist

    g = int(dim**0.5)
    if not fake and g * g != dim:
        raise ValueError("real features need a square dim (grid of means)")

    def _pixel_grid(p: bytes):
        try:
            _, w, h, arr = _decode_real(p)
        except Exception:  # incl. struct.error from truncated headers
            return None  # undecodable row: null features, stage survives
        gray = arr.mean(axis=2)
        yi = (np.arange(h) * g // h).clip(max=g - 1)
        xi = (np.arange(w) * g // w).clip(max=g - 1)
        grid = np.zeros((g, g), dtype="float64")
        cnt = np.zeros((g, g), dtype="float64")
        np.add.at(grid, (yi[:, None], xi[None, :]), gray)
        np.add.at(cnt, (yi[:, None], xi[None, :]), 1.0)
        feat = (grid / np.maximum(cnt, 1)).reshape(dim).astype("float32")
        total = feat.sum()
        return feat / total if total else feat

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                feats.append(_byte_hist(p) if fake else _pixel_grid(p))
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


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("start_s", StringType()),
        StructField("rms", StringType()),
        StructField("zcr", StringType()),
    ]
)


def audio_features(
    binaries: DataFrame,
    sample_rate: int = 16000,
    window_s: float = 0.5,
    hop_s: float = 0.25,
    max_chunks: int = 16,
) -> DataFrame:
    """REAL waveform features over int16-PCM payloads: per overlapping
    chunk, RMS energy (silence/level detection) and zero-crossing rate
    (a crude voiced/unvoiced + pitch-register signal) — classic audio
    curation features, computed with numpy inside Arrow-batched
    mapInPandas. No audio library: int16 PCM is a numpy frombuffer
    away, exactly like the PPM/BMP image path. Values format as
    %.6f strings so results are bit-stable across platforms.

    Container formats (wav headers, mp3, ...) would decode to PCM
    first; a 44-byte canonical WAV header is skipped when present, so
    plain PCM and canonical WAV both work.
    """

    import numpy as np

    frame = int(sample_rate * window_s)
    hop = int(sample_rate * hop_s)

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {
                "doc_id": [], "chunk_idx": [], "start_s": [],
                "rms": [], "zcr": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p or b"")
                if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                    raw = raw[44:]
                if len(raw) % 2:
                    raw = raw[:-1]
                x = np.frombuffer(raw, dtype="<i2").astype("float64")
                n = len(x)
                idx = 0
                for start in range(0, max(n, 1), hop):
                    if idx >= max_chunks or start >= n:
                        break
                    w = x[start : start + frame]
                    if not len(w):
                        break
                    rms = float(np.sqrt(np.mean(w * w))) / 32768.0
                    zc = float(np.mean(np.abs(np.diff(np.signbit(w))))) if len(w) > 1 else 0.0
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(idx)
                    out["start_s"].append("%.6f" % (start / sample_rate))
                    out["rms"].append("%.6f" % rms)
                    out["zcr"].append("%.6f" % zc)
                    idx += 1
            yield pd.DataFrame(out)

    return binaries.select("doc_id", "payload").mapInPandas(
        go, schema=AUDIO_FEATURES_SCHEMA
    )
