"""Streaming training-data curation: the batch pipeline operators
applied to unbounded document streams.

The batch operators (operators/text.py, operators/dedup.py) are pure
column expressions, so they lift to Structured Streaming unchanged —
this module packages the stateful pieces:

- ``stream_exact_dedup``: keep the first occurrence of each content
  hash. State is one hash per distinct document;
  ``dropDuplicatesWithinWatermark`` bounds it by event time when a
  watermark column is provided (late duplicates beyond the watermark
  are the same trade every streaming dedup makes).
- ``stream_curate``: quality/language/repetition filtering + PII
  scrubbing as a map-only streaming stage (no state at all).

At 100 TB/day the dedup state is the bottleneck to plan for: the
content hash is 32 bytes/doc in the state store (RocksDB provider via
``build_session(rocksdb_state=True)``), sharded by hash — uniform by
construction, no skew.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..operators import text as text_ops


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    time_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-occurrence-wins exact dedup on a document stream.

    With ``time_col`` the state is bounded: duplicates arriving within
    the watermark window dedup exactly; older ones age out of state.
    Without it, state grows with distinct documents (exact, unbounded
    — the batch-parity mode).
    """

    hashed = stream.withColumn("__h", F.md5(F.col(text_col)))
    if time_col is not None:
        return hashed.withWatermark(time_col, watermark) \
            .dropDuplicatesWithinWatermark(["__h"]).drop("__h")
    return hashed.dropDuplicates(["__h"]).drop("__h")


def stream_curate(
    stream: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.2,
    max_repetition: float = 0.9,
    require_lang: bool = True,
) -> DataFrame:
    """Map-only streaming curation stage: quality score, language ID,
    repetition ratio, and PII scrubbing composed as ONE projection
    (raw Column expressions, no self-joins — a streaming self-join
    would demand watermarks and state for what is purely map work).
    Zero state; fuses into the micro-batch scan."""

    out = stream.select(
        "*",
        text_ops.quality_columns(text_col)["quality"].alias("quality"),
        text_ops.lang_id_column(text_col).alias("lang_pred"),
        text_ops.repetition_ratio_column(text_col).alias("rep_ratio"),
        text_ops.redact_column(text_col).alias("__redacted"),
    ).filter(
        (F.col("quality") >= min_quality)
        & (F.col("rep_ratio") <= max_repetition)
    )
    if require_lang:
        out = out.filter(F.col("lang_pred") != "und")
    return out.drop(text_col).withColumnRenamed("__redacted", text_col)
