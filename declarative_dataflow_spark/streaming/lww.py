"""Streaming LastWriteWins: the reference's custom stateful operator
(src/operators/last_write_wins.rs:16-104) re-expressed as a Spark
stateful transformation.

The reference keeps per-entity state (current value + its time) and
retracts the previous value when a newer write arrives, tolerating
out-of-order input by comparing event times. Here the state lives in
the Structured Streaming state store keyed by entity:
``applyInPandasWithState`` holds (t, v) per entity; each micro-batch
emits the entity's current winner after folding the batch — late
writes (older t) do not displace a newer stored value.

Trace slack: the reference compacts attribute traces to
``frontier - trace_slack`` (src/domain/mod.rs:291-341), bounding state
at the price of not distinguishing older times. The Spark analog is
event-time state eviction: with ``trace_slack_ms`` set, an entity
whose winning write falls ``trace_slack_ms`` behind the stream's
event-time watermark has its state evicted. Within the slack the
operator answers exactly as the unbounded one; a write arriving more
than a slack behind the frontier may resurface after eviction — the
same contract as the reference's compacted arrangements, which cannot
distinguish times below the compaction frontier.

Scale: state is O(entities active within the slack), partitioned by
the grouping hash; use the RocksDB state store provider for very large
keyspaces.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("e", LongType()),
        StructField("v", StringType()),
        StructField("t", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("t", LongType()), StructField("v", StringType())]
)


def _fold_batch(best_t, best_v, pdfs: Iterator[pd.DataFrame]):
    """Fold writes into the current (t, v) winner. Ties on t resolve to
    the lexicographically-larger value for determinism (the reference
    resolves by transaction order within a batch after sorting by
    time, last_write_wins.rs:57-58)."""

    for pdf in pdfs:
        for t, v in zip(pdf["t"], pdf["v"]):
            t = int(t)
            if (
                best_t is None
                or t > best_t
                or (t == best_t and str(v) > str(best_v))
            ):
                best_t, best_v = t, str(v)
    return best_t, best_v


def _lww_fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (e,) = key
    best_t, best_v = state.get if state.exists else (None, None)
    best_t, best_v = _fold_batch(best_t, best_v, pdfs)
    state.update((best_t, best_v))
    yield pd.DataFrame({"e": [e], "v": [best_v], "t": [best_t]})


def _lww_fold_slack(slack_ms: int):
    """Fold with event-time eviction: state whose winner lags the
    watermark by more than ``slack_ms`` times out and is removed
    (the advance_traces analog, src/domain/mod.rs:291-341)."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Evict silently: compaction is invisible to consumers —
            # the changelog never retracts a compacted entity.
            state.remove()
            return
        (e,) = key
        best_t, best_v = state.get if state.exists else (None, None)
        best_t, best_v = _fold_batch(best_t, best_v, pdfs)
        state.update((best_t, best_v))
        state.setTimeoutTimestamp(best_t + slack_ms)
        yield pd.DataFrame({"e": [e], "v": [best_v], "t": [best_t]})

    return fold


def stream_last_write_wins(
    writes: DataFrame, trace_slack_ms: Optional[int] = None
) -> DataFrame:
    """Apply LWW semantics to a streaming DataFrame of (e, v, t).

    Returns a streaming DataFrame emitting each entity's current value
    whenever it may have changed (update semantics).

    ``trace_slack_ms`` bounds state: ``t`` is interpreted as epoch
    milliseconds, an event-time watermark of ``trace_slack_ms`` is
    applied, and entities idle past the slack are evicted. Answers are
    exact for data within the slack of the frontier; older stragglers
    may resurface (the reference's compaction contract).
    """

    if trace_slack_ms is None:
        return writes.groupBy("e").applyInPandasWithState(
            _lww_fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    with_et = writes.withColumn(
        "__et", F.timestamp_millis(F.col("t"))
    ).withWatermark("__et", f"{int(trace_slack_ms)} milliseconds")
    return with_et.groupBy("e").applyInPandasWithState(
        _lww_fold_slack(int(trace_slack_ms)),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
