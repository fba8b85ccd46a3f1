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

Scale: state is O(distinct entities), partitioned by the grouping
hash; use the RocksDB state store provider for very large keyspaces.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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


def _lww_fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold a batch of writes for one entity into (t, v) state.

    Ties on t resolve to the lexicographically-larger value for
    determinism (the reference resolves by transaction order within a
    batch after sorting by time, last_write_wins.rs:57-58).
    """

    (e,) = key
    if state.exists:
        best_t, best_v = state.get
    else:
        best_t, best_v = None, None
    for pdf in pdfs:
        for t, v in zip(pdf["t"], pdf["v"]):
            t = int(t)
            if (
                best_t is None
                or t > best_t
                or (t == best_t and str(v) > str(best_v))
            ):
                best_t, best_v = t, str(v)
    state.update((best_t, best_v))
    yield pd.DataFrame({"e": [e], "v": [best_v], "t": [best_t]})


def stream_last_write_wins(writes: DataFrame) -> DataFrame:
    """Apply LWW semantics to a streaming DataFrame of (e, v, t).

    Returns a streaming DataFrame emitting each entity's current value
    whenever it may have changed (update semantics).
    """

    return writes.groupBy("e").applyInPandasWithState(
        _lww_fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
